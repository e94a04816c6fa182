"""Property-based tests (hypothesis) — randomized cross-checks the
reference's own test suite lacks (SURVEY §5). Example counts are small:
every example runs Spark jobs.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from noaa_oracle_spark.operators.dedup import distinct_on
from noaa_oracle_spark.operators.windows import carry_forward
from noaa_oracle_spark.sql.rewriter import rewrite_duckdb_sql

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),                      # key
        st.integers(0, 5),                      # ord
        st.one_of(st.none(), st.integers(-5, 5)),  # value (nullable)
        st.integers(0, 10 ** 6),                # unique-ish tiebreak seed
    ),
    min_size=1,
    max_size=25,
)


@SLOW
@given(rows=rows_strategy)
def test_distinct_on_matches_pandas(spark, rows):
    """distinct_on(keys, order) ≡ pandas sort + groupby-first under the
    same total order."""
    uniq = [(k, o, v, i) for i, (k, o, v, _) in enumerate(rows)]
    df = spark.createDataFrame(uniq, "k int, o int, v int, uid int")
    got = {
        (r["k"], r["o"], r["v"], r["uid"])
        for r in distinct_on(
            df, ["k"], [F.desc("o"), F.asc("uid")]
        ).collect()
    }
    pdf = pd.DataFrame(uniq, columns=["k", "o", "v", "uid"])
    pdf = pdf.sort_values(["k", "o", "uid"], ascending=[True, False, True])
    exp = {
        tuple(int(x) if pd.notna(x) else None for x in row)
        for row in pdf.groupby("k").head(1).itertuples(index=False)
    }
    assert got == exp


@SLOW
@given(rows=rows_strategy)
def test_carry_forward_matches_pandas_ffill(spark, rows):
    uniq = [(k, i, v) for i, (k, _, v, _) in enumerate(rows)]
    df = spark.createDataFrame(uniq, "k int, seq int, v int")
    out = carry_forward(df, ["v"], ["k"], [F.asc("seq")])
    got = {(r["k"], r["seq"], r["v"]) for r in out.collect()}
    pdf = pd.DataFrame(uniq, columns=["k", "seq", "v"]).sort_values(
        ["k", "seq"]
    )
    pdf["v"] = pdf.groupby("k")["v"].ffill()
    exp = {
        (int(k), int(s), int(v) if pd.notna(v) else None)
        for k, s, v in pdf.itertuples(index=False)
    }
    assert got == exp


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 9), st.integers(-99, 99)),
        min_size=1,
        max_size=20,
    )
)
def test_distinct_on_rewrite_matches_duckdb(spark, rows):
    """The DISTINCT ON string rewrite run on Spark ≡ DuckDB running the
    original, on random tables, under a total order."""
    uniq = [(k, o, v, i) for i, (k, o, v) in enumerate(rows)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k INT, o INT, v INT, uid INT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", uniq)
    sql = (
        "SELECT DISTINCT ON (k) k, o, v, uid FROM t "
        "ORDER BY k, o DESC, uid ASC"
    )
    exp = sorted(map(tuple, con.execute(sql).fetchall()))

    spark.createDataFrame(uniq, "k int, o int, v int, uid int").createOrReplaceTempView("t")
    got = sorted(
        tuple(r) for r in spark.sql(rewrite_duckdb_sql(sql)).collect()
    )
    assert got == exp
