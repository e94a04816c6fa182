"""Randomized differential SQL testing (sqllogictest-style).

A seeded generator composes >200 filter/aggregate/window SQL fragments in
DuckDB dialect; each fragment runs on BOTH engines — DuckDB directly over
the sf0.001 parquet, and Spark over the same data via
`rewrite_duckdb_sql` + temp view (the /raw surface path,
reference crates/oracle/templates/raw_data.js:199-231) — and the result
multisets are compared order-insensitively with float normalization.

Generator invariants that keep the comparison exact cross-engine:
  - every select item is aliased identically on both sides (the compare
    sorts columns by name);
  - order-sensitive window functions (row_number/lag/lead/sum-over-rows)
    always order by a verified-unique key (l_orderkey, l_linenumber,
    l_partkey, l_suppkey, l_extendedprice — (orderkey, linenumber) alone
    is NOT unique in the driver's synthetic lineitem); ranking
    over ties uses rank/dense_rank only (tie-stable);
  - division denominators are strictly positive expressions;
  - floats are normalized to 6 significant digits (partial-aggregation
    order differs between engines at ~1e-15 relative);
  - DuckDB's HUGEINT (SUM of BIGINT) and DECIMAL results are normalized
    through int/float, so no CAST noise is needed in the fragments.

The corpus is deterministic (SEED below): a failure reproduces by index,
and the printed fragment is directly runnable in both engines.
"""

from __future__ import annotations

import decimal
import math
import random

import duckdb
import pytest

from noaa_oracle_spark.sql import rewrite_duckdb_sql
from noaa_oracle_spark.suite import load
from tests.conftest import SF_DIR

SEED = 20260814

NUM = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
INT = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STR = ["l_returnflag", "l_linestatus"]
TS = "l_shipdate"


@pytest.fixture(scope="module")
def engines(spark):
    load(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, SF_DIR, "orders").createOrReplaceTempView("orders")
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield spark, con
    con.close()


def _cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    if isinstance(v, (int, float)):
        # one format path for ALL numerics: int 5, float 5.0, and Decimal 5
        # must normalize identically, and large integral doubles must not
        # fork between integer repr and %.6g (sum-of-prices 19792727.48 vs
        # .00 would otherwise render '1.97927e+07' vs '19792727')
        return str(v) if abs(v) >= 2**53 else f"{float(v):.6g}"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_cell(r[i]) for i in order) for r in rows)


def _diff(spark, con, sql: str) -> str | None:
    """Run one fragment on both engines; return a description on mismatch."""
    sdf = spark.sql(rewrite_duckdb_sql(sql))
    got = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(sql)
    want = _normalize(res.fetchall(), [d[0] for d in res.description])
    if got != want:
        for i, (g, w) in enumerate(zip(got, want)):
            if g != w:
                return f"first diff at row {i}: spark={g} duckdb={w}"
        return f"row counts: spark={len(got)} duckdb={len(want)}"
    return None


# ---------------------------------------------------------------------------
# expression grammar
# ---------------------------------------------------------------------------


def num_expr(r: random.Random, depth: int = 0) -> str:
    if depth >= 2:
        return r.choice(NUM + [f"{r.randint(1, 9)}.{r.randint(0, 99):02d}"])
    pick = r.randrange(10)
    a = lambda: num_expr(r, depth + 1)  # noqa: E731
    if pick <= 2:
        return r.choice(NUM)
    if pick == 3:
        op = r.choice(["+", "-", "*"])
        return f"({a()} {op} {a()})"
    if pick == 4:
        return f"round({a()}, {r.randint(0, 3)})"
    if pick == 5:
        return f"abs({a()} - {a()})"
    if pick == 6:
        return f"(CASE WHEN {pred(r, depth + 1)} THEN {a()} ELSE {a()} END)"
    if pick == 7:
        return f"coalesce(nullif({r.choice(NUM)}, 0), {a()})"
    if pick == 8:
        return f"{r.choice(['least', 'greatest'])}({a()}, {a()})"
    return f"({a()} / (l_quantity + 1))"


def int_expr(r: random.Random) -> str:
    pick = r.randrange(4)
    if pick == 0:
        return r.choice(INT)
    if pick == 1:
        return f"({r.choice(INT)} % {r.randint(2, 13)})"
    if pick == 2:
        return f"length({r.choice(STR)})"
    return f"year({TS})"


def str_expr(r: random.Random) -> str:
    pick = r.randrange(6)
    if pick == 0:
        return r.choice(STR)
    if pick == 1:
        return f"upper({r.choice(STR)})"
    if pick == 2:
        return f"(l_returnflag || '_' || l_linestatus)"
    if pick == 3:
        return f"substr({r.choice(STR)}, 1, 1)"
    if pick == 4:
        return f"coalesce(nullif({r.choice(STR)}, 'N'), '~')"
    return f"strftime({TS}, '%Y-%m')"


def ts_expr(r: random.Random) -> str:
    pick = r.randrange(3)
    if pick == 0:
        return f"DATE_TRUNC('{r.choice(['day', 'month', 'year'])}', {TS})::TEXT"
    if pick == 1:
        return f"strftime({TS}, '%Y-%m-%d')"
    return f"year({TS})"


def pred(r: random.Random, depth: int = 0) -> str:
    if depth >= 2:
        return f"{r.choice(NUM)} {r.choice(['<', '>', '<=', '>='])} {r.randint(0, 40)}"
    pick = r.randrange(9)
    if pick == 0:
        return (
            f"{num_expr(r, depth + 1)} {r.choice(['<', '>', '<=', '>=', '='])} "
            f"{num_expr(r, depth + 1)}"
        )
    if pick == 1:
        vals = ", ".join(f"'{v}'" for v in r.sample(["A", "N", "R", "O", "F"], r.randint(1, 3)))
        return f"{r.choice(STR)} IN ({vals})"
    if pick == 2:
        lo = r.randint(0, 20)
        return f"{r.choice(NUM)} BETWEEN {lo} AND {lo + r.randint(1, 30)}"
    if pick == 3:
        y, m = r.randint(1992, 1998), r.randint(1, 12)
        return f"{TS} {r.choice(['<', '>='])} DATE '{y}-{m:02d}-01'"
    if pick == 4:
        return f"{r.choice(NUM + STR)} IS {r.choice(['NULL', 'NOT NULL'])}"
    if pick == 5:
        return f"NOT ({pred(r, depth + 1)})"
    if pick == 6:
        return f"({pred(r, depth + 1)} AND {pred(r, depth + 1)})"
    if pick == 7:
        return f"({pred(r, depth + 1)} OR {pred(r, depth + 1)})"
    return f"({int_expr(r)} % {r.randint(2, 5)}) = 0"


# ---------------------------------------------------------------------------
# fragment families
# ---------------------------------------------------------------------------


def scalar_fragment(r: random.Random) -> str:
    items = [f"{e} AS c{i}" for i, e in enumerate(
        [r.choice([num_expr, int_expr, str_expr, ts_expr])(r) for _ in range(r.randint(2, 4))]
    )]
    return (
        f"SELECT {', '.join(items)} FROM lineitem WHERE {pred(r)}"
    )


AGGS = [
    lambda r: "count(*)",
    lambda r: f"count({r.choice(NUM + STR)})",
    lambda r: f"sum({num_expr(r, 1)})",
    lambda r: f"sum({r.choice(INT)})",
    lambda r: f"min({r.choice(NUM + STR)})",
    lambda r: f"max({r.choice(NUM + STR)})",
    lambda r: f"avg({num_expr(r, 1)})",
    lambda r: f"count(DISTINCT {r.choice(STR + INT)})",
    lambda r: f"sum({r.choice(NUM)}) FILTER (WHERE {pred(r, 1)})",
    lambda r: f"count(*) FILTER (WHERE {pred(r, 1)})",
]


def agg_fragment(r: random.Random) -> str:
    keys = r.sample(STR + [f"strftime({TS}, '%Y')", f"({r.choice(INT)} % 5)"], r.randint(1, 2))
    key_items = [f"{k} AS k{i}" for i, k in enumerate(keys)]
    aggs = [f"{r.choice(AGGS)(r)} AS a{i}" for i in range(r.randint(1, 3))]
    sql = (
        f"SELECT {', '.join(key_items + aggs)} FROM lineitem"
        f" WHERE {pred(r)} GROUP BY {', '.join(keys)}"
    )
    if r.random() < 0.3:
        sql += f" HAVING count(*) > {r.randint(0, 3)}"
    return sql


def window_fragment(r: random.Random) -> str:
    part = r.choice(STR + [f"({r.choice(INT)} % 4)"])
    unique_order = "l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice"
    pick = r.randrange(5)
    if pick == 0:
        w = f"row_number() OVER (PARTITION BY {part} ORDER BY {unique_order})"
    elif pick == 1:
        w = (
            f"{r.choice(['rank', 'dense_rank'])}() OVER "
            f"(PARTITION BY {part} ORDER BY {r.choice(NUM)}, {unique_order})"
        )
    elif pick == 2:
        w = (
            f"lag({r.choice(NUM)}, {r.randint(1, 2)}) OVER "
            f"(PARTITION BY {part} ORDER BY {unique_order})"
        )
    elif pick == 3:
        w = (
            f"lead({r.choice(NUM)}) OVER "
            f"(PARTITION BY {part} ORDER BY {unique_order})"
        )
    else:
        w = (
            f"sum({r.choice(NUM)}) OVER (PARTITION BY {part} "
            f"ORDER BY {unique_order} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    return (
        f"SELECT l_orderkey AS k0, l_linenumber AS k1, {w} AS w0 "
        f"FROM lineitem WHERE {pred(r)}"
    )


def dialect_fragment(r: random.Random) -> str:
    """Rewriter-specific DuckDB dialect: DISTINCT ON and QUALIFY."""
    if r.random() < 0.5:
        key = r.choice(STR)
        return (
            f"SELECT DISTINCT ON ({key}) {key} AS k0, l_orderkey AS k1, "
            f"l_linenumber AS k2 FROM lineitem WHERE {pred(r)} "
            f"ORDER BY {key}, l_orderkey, l_linenumber, l_partkey, l_suppkey"
        )
    part = r.choice(STR)
    return (
        f"SELECT l_orderkey AS k0, l_linenumber AS k1, l_quantity AS v0 "
        f"FROM lineitem WHERE {pred(r)} "
        f"QUALIFY row_number() OVER (PARTITION BY {part} ORDER BY "
        f"l_orderkey, l_linenumber, l_partkey, l_suppkey) <= {r.randint(1, 4)}"
    )


OSTR = ["o_orderstatus", "o_orderpriority"]


def _orders_pred(r: random.Random) -> str:
    pick = r.randrange(3)
    if pick == 0:
        y, m = r.randint(1995, 2001), r.randint(1, 12)
        return f"o_orderdate {r.choice(['<', '>='])} DATE '{y}-{m:02d}-01'"
    if pick == 1:
        return f"o_totalprice {r.choice(['<', '>'])} {r.randint(10, 300) * 1000}"
    vals = ", ".join(f"'{v}'" for v in r.sample(["O", "F", "P"], r.randint(1, 2)))
    return f"o_orderstatus IN ({vals})"


def join_fragment(r: random.Random) -> str:
    """Two-table shapes: inner-join aggregate, left-join conditional
    counts (outer-side predicate only, so left-ness is preserved), and
    EXISTS / NOT EXISTS semi/anti subqueries."""
    pick = r.randrange(4)
    if pick == 0:
        key = r.choice(OSTR)
        return (
            f"SELECT {key} AS k0, count(*) AS a0, "
            f"round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS a1 "
            f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE {pred(r)} GROUP BY {key}"
        )
    if pick == 1:
        return (
            f"SELECT o_orderstatus AS k0, count(*) AS a0, "
            f"count(l_orderkey) AS a1, "
            f"count(*) FILTER (WHERE o_totalprice > {r.randint(50, 200) * 1000}) AS a2 "
            f"FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey "
            f"WHERE {_orders_pred(r)} GROUP BY o_orderstatus"
        )
    neg = "NOT " if pick == 3 else ""
    return (
        f"SELECT o_orderpriority AS k0, count(*) AS a0 FROM orders "
        f"WHERE {_orders_pred(r)} AND {neg}EXISTS "
        f"(SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        f"AND {pred(r, 1)}) GROUP BY o_orderpriority"
    )


FAMILIES = [
    ("scalar", scalar_fragment, 80),
    ("agg", agg_fragment, 80),
    ("window", window_fragment, 50),
    ("dialect", dialect_fragment, 20),
    ("join", join_fragment, 40),
]


def _corpus(name: str, build, n: int) -> list[str]:
    r = random.Random(f"{SEED}:{name}")
    return [build(r) for _ in range(n)]


def test_corpus_is_at_least_200_and_deterministic():
    total = sum(n for _, _, n in FAMILIES)
    assert total >= 200
    for name, build, n in FAMILIES:
        assert _corpus(name, build, n) == _corpus(name, build, n)


@pytest.mark.parametrize("name,build,n", FAMILIES, ids=[f[0] for f in FAMILIES])
def test_differential(engines, name, build, n):
    spark, con = engines
    failures = []
    for i, sql in enumerate(_corpus(name, build, n)):
        try:
            d = _diff(spark, con, sql)
        except Exception as exc:  # engine error is a failure too
            d = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
        if d:
            failures.append(f"[{name}:{i}] {d}\n  SQL: {sql}")
    assert not failures, "\n".join(failures[:10]) + f"\n({len(failures)} total)"
