"""DuckDB-dialect → Spark SQL rewriter for /raw-style raw-SQL parity.

The reference's browser page loads snapshot parquet into DuckDB-WASM tables
and runs user SQL (raw_data.js:199-231); its canned queries (raw_data.js:
546-680) use DuckDB dialect features. Spark SQL natively accepts most of the
dialect already (`agg FILTER (WHERE …)`, `x::TYPE` casts, `GREATEST`,
`COALESCE`, `NULLIF`, correlated scalar subqueries); this module rewrites
the rest as a *string-level* pre-pass — deliberately not a Catalyst rule
(SURVEY §4: no custom optimizer work is needed for parity):

  - SELECT DISTINCT ON (keys) … ORDER BY keys, rest
        → row_number() OVER (PARTITION BY keys ORDER BY rest) = 1
  - QUALIFY pred → subquery + outer WHERE (struct(*) round-trip when the
        select list is `*` and the predicate holds an inline window)
  - DATE_TRUNC('part', x)           → CAST(DATE_TRUNC(...) AS DATE) so the
        ::TEXT rendering matches DuckDB's DATE output ('YYYY-MM-DD')
  - ::TIMESTAMPTZ AT TIME ZONE 'UTC' / ::TIMESTAMPTZ / ::TEXT
        → ::TIMESTAMP / ::STRING  (session TZ pinned to UTC)
  - regexp_matches(x, p)            → regexp_like(x, p)
  - EXTRACT(EPOCH FROM (a - b))     → (unix_timestamp(a) - unix_timestamp(b))
  - UNION ALL BY NAME               → handled structurally: register_raw_tables
        builds the observations/forecasts views from the schema-merging
        reader, so raw SQL never needs the BY NAME union.

Scanning is quote-aware and paren-balanced; rewrites nest (a DISTINCT ON
body containing casts is rewritten inside-out).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from noaa_oracle_spark.sources.catalog import SnapshotCatalog
from noaa_oracle_spark.sources.reader import read_snapshots

_DISTINCT_ON_RE = re.compile(r"SELECT\s+DISTINCT\s+ON\s*\(", re.IGNORECASE)
_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
_FROM_RE = re.compile(r"\bFROM\b", re.IGNORECASE)


def _scan_balanced(sql: str, start: int) -> int:
    """Index just past the ')' matching the '(' at `start`."""
    depth = 0
    i = start
    while i < len(sql):
        c = sql[i]
        if c == "'":
            i = sql.index("'", i + 1)
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parentheses in SQL")


def _find_top_level(sql: str, pattern: re.Pattern, start: int) -> int:
    """First match of `pattern` at paren-depth 0 from `start`, or -1.
    Skips string literals."""
    depth = 0
    i = start
    while i < len(sql):
        c = sql[i]
        if c == "'":
            i = sql.index("'", i + 1) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                return -1  # left the enclosing scope
            depth -= 1
        elif depth == 0:
            m = pattern.match(sql, i)
            if m:
                return i
        i += 1
    return -1


def _split_top_level_commas(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "'":
            j = s.index("'", i + 1)
            cur.append(s[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        out.append("".join(cur).strip())
    return out


def _scope_end(sql: str, start: int) -> int:
    """Index where the current SELECT's scope ends: the ')' closing the
    enclosing parenthesis, or end of string."""
    depth = 0
    i = start
    while i < len(sql):
        c = sql[i]
        if c == "'":
            i = sql.index("'", i + 1) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                return i
            depth -= 1
        i += 1
    return len(sql)


def _rewrite_distinct_on(sql: str) -> str:
    m = _DISTINCT_ON_RE.search(sql)
    if not m:
        return sql
    sel_start = m.start()
    keys_open = m.end() - 1
    keys_close = _scan_balanced(sql, keys_open)
    keys = sql[keys_open + 1 : keys_close - 1].strip()
    n_keys = len(_split_top_level_commas(keys))

    from_pos = _find_top_level(sql, _FROM_RE, keys_close)
    if from_pos < 0:
        raise ValueError("DISTINCT ON without FROM")
    select_list = sql[keys_close:from_pos].strip()

    order_pos = _find_top_level(sql, _ORDER_BY_RE, from_pos)
    scope_close = _scope_end(sql, from_pos)
    if order_pos < 0 or order_pos > scope_close:
        # no ORDER BY: DuckDB picks an arbitrary row; order by the keys.
        body = sql[from_pos:scope_close].rstrip()
        per_group_order = keys
    else:
        body = sql[from_pos:order_pos].rstrip()
        order_list = sql[order_pos + len("ORDER BY") : scope_close]
        # skip the ending of "ORDER BY" keyword length variance
        order_list = re.sub(r"^\s*BY\b", "", order_list, flags=re.IGNORECASE)
        items = _split_top_level_commas(order_list)
        suffix = items[n_keys:]
        per_group_order = ", ".join(suffix) if suffix else keys

    # The outer projection must reference the subquery's OUTPUT names —
    # re-evaluating `expr AS alias` against __dedup fails when the base
    # column is shadowed by its alias (found by differential fuzzing:
    # `SELECT DISTINCT ON (k) k AS k0 … ORDER BY k`). `*` passes through;
    # aliased/plain items project by result name.
    items = _split_top_level_commas(select_list)
    outer_names = ", ".join(
        it.strip() if it.strip() == "*" else _output_name(it)
        for it in items
    )
    rewritten = (
        f"SELECT {outer_names} FROM (SELECT {select_list}, "
        f"row_number() OVER (PARTITION BY {keys} ORDER BY {per_group_order}) "
        f"AS __rn {body}) __dedup WHERE __rn = 1"
    )
    out = sql[:sel_start] + rewritten + sql[scope_close:]
    return _rewrite_distinct_on(out)  # handle further occurrences


_QUALIFY_RE = re.compile(r"QUALIFY\b", re.IGNORECASE)
_SELECT_KW_RE = re.compile(r"SELECT\b", re.IGNORECASE)
_LIMIT_RE = re.compile(r"LIMIT\b", re.IGNORECASE)
_OVER_RE = re.compile(r"\bOVER\s*\(", re.IGNORECASE)
_AS_ALIAS_RE = re.compile(r"\s+AS\s+(\w+)\s*$", re.IGNORECASE)
_IDENT_PATH_RE = re.compile(r"^[\w.]+$")


def _keyword_positions(sql: str, pattern: re.Pattern) -> list[tuple[int, int]]:
    """(pos, paren_depth) of keyword matches outside string literals,
    requiring a word boundary before the match."""
    out: list[tuple[int, int]] = []
    depth = 0
    i = 0
    while i < len(sql):
        c = sql[i]
        if c == "'":
            i = sql.index("'", i + 1) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
            m = pattern.match(sql, i)
            if m:
                out.append((i, depth))
                i = m.end()
                continue
        i += 1
    return out


def _output_name(item: str) -> str:
    """Result-column name of a select-list item: trailing AS alias, or the
    last component of a plain identifier path."""
    item = item.strip()
    m = _AS_ALIAS_RE.search(item)
    if m:
        return m.group(1)
    if _IDENT_PATH_RE.match(item):
        return item.split(".")[-1]
    raise ValueError(
        f"QUALIFY rewrite needs an alias for select item: {item!r}"
    )


def _rewrite_qualify(sql: str) -> str:
    """DuckDB QUALIFY → Spark subquery + WHERE.

    Three shapes, innermost occurrence first:
      - predicate references select-list aliases only (no OVER):
            SELECT s FROM b QUALIFY p  →
            SELECT * FROM (SELECT s FROM b) __qsub WHERE p
      - predicate holds an inline window, select list is `*`:
            struct(*) round-trip keeps every column without naming them:
            SELECT __row.* FROM (SELECT struct(*) AS __row, (p) AS __q
                                 FROM b) __qsub WHERE __q
      - predicate holds an inline window, explicit select list:
            the window evaluates in the inner scope (base columns still
            visible); the outer projects the derived output names.
    A trailing ORDER BY / LIMIT stays on the outer query, where select
    aliases remain referencable."""
    occ = _keyword_positions(sql, _QUALIFY_RE)
    if not occ:
        return sql
    pos, _depth = max(occ, key=lambda t: t[1])

    # innermost paren scope containing pos
    stack: list[int] = []
    i = 0
    while i < pos:
        c = sql[i]
        if c == "'":
            i = sql.index("'", i + 1) + 1
            continue
        if c == "(":
            stack.append(i)
        elif c == ")":
            stack.pop()
        i += 1
    scope_start = (stack[-1] + 1) if stack else 0
    scope_close = _scope_end(sql, pos)

    scope = sql[scope_start:scope_close]
    sel_rel = [
        p for (p, d) in _keyword_positions(scope, _SELECT_KW_RE)
        if d == 0 and scope_start + p < pos
    ]
    if not sel_rel:
        raise ValueError("QUALIFY without an owning SELECT")
    sel_pos = scope_start + sel_rel[-1]

    from_pos = _find_top_level(sql, _FROM_RE, sel_pos)
    if from_pos < 0 or from_pos > pos:
        raise ValueError("QUALIFY without FROM")
    select_list = sql[sel_pos + len("SELECT"):from_pos].strip()
    if re.match(r"^\s*DISTINCT\b", select_list, re.IGNORECASE):
        raise ValueError("QUALIFY with SELECT DISTINCT is not supported")
    body = sql[from_pos:pos].rstrip()

    after = pos + len("QUALIFY")
    ends = [
        p
        for p in (
            _find_top_level(sql, _ORDER_BY_RE, after),
            _find_top_level(sql, _LIMIT_RE, after),
        )
        if 0 <= p <= scope_close
    ]
    pred_end = min(ends) if ends else scope_close
    pred = sql[after:pred_end].strip()
    tail = sql[pred_end:scope_close].strip()
    tail = f" {tail}" if tail else ""

    if not _OVER_RE.search(pred):
        new = (
            f"SELECT * FROM (SELECT {select_list} {body}) __qsub "
            f"WHERE {pred}{tail}"
        )
    elif select_list == "*":
        new = (
            f"SELECT __row.* FROM (SELECT struct(*) AS __row, ({pred}) "
            f"AS __q {body}) __qsub WHERE __q{tail}"
        )
    else:
        items = _split_top_level_commas(select_list)
        names = ", ".join(_output_name(it) for it in items)
        new = (
            f"SELECT {names} FROM (SELECT {select_list}, ({pred}) AS __q "
            f"{body}) __qsub WHERE __q{tail}"
        )

    out = sql[:sel_pos] + new + sql[scope_close:]
    return _rewrite_qualify(out)


_STRING_AGG_RE = re.compile(r"string_agg\s*\(", re.IGNORECASE)
_ORDER_BY_INNER_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)


def _rewrite_string_agg(sql: str) -> str:
    """DuckDB `string_agg(x, sep ORDER BY k)` → Spark
    `listagg(x, sep) WITHIN GROUP (ORDER BY k)`; without ORDER BY a plain
    listagg (both engines then leave element order unspecified)."""
    m = _STRING_AGG_RE.search(sql)
    if not m:
        return sql
    open_paren = m.end() - 1
    close = _scan_balanced(sql, open_paren)
    inner = sql[open_paren + 1 : close - 1]
    om = _ORDER_BY_INNER_RE.search(inner)
    # ORDER BY must be top-level within the call args
    if om and _find_top_level(inner, _ORDER_BY_INNER_RE, 0) == om.start():
        args = inner[: om.start()].rstrip().rstrip(",")
        order = inner[om.end():].strip()
        new = f"listagg({args}) WITHIN GROUP (ORDER BY {order})"
    else:
        new = f"listagg({inner})"
    out = sql[: m.start()] + new + sql[close:]
    return _rewrite_string_agg(out)


def _rewrite_date_trunc(sql: str) -> str:
    """DATE_TRUNC('day'|'month'|'year', x) → CAST(… AS DATE) so ::TEXT
    renders DuckDB's DATE shape ('YYYY-MM-DD'). Replacements run
    right-to-left so earlier match offsets stay valid."""
    pat = re.compile(r"DATE_TRUNC\s*\(\s*'(day|month|year)'\s*,", re.IGNORECASE)
    for m in reversed(list(pat.finditer(sql))):
        open_paren = sql.index("(", m.start())
        close = _scan_balanced(sql, open_paren)
        sql = (
            sql[: m.start()]
            + "CAST("
            + sql[m.start() : close]
            + " AS DATE)"
            + sql[close:]
        )
    return sql


def _escape_backslashes_in_literals(sql: str) -> str:
    """DuckDB string literals are verbatim ('\\s' is backslash-s); Spark SQL
    treats backslash as an escape by default, silently turning regex '\\s'
    into 's'. Double every backslash inside single-quoted literals."""
    out = []
    i = 0
    in_str = False
    while i < len(sql):
        c = sql[i]
        if c == "'":
            in_str = not in_str
            out.append(c)
        elif c == "\\" and in_str:
            out.append("\\\\")
        else:
            out.append(c)
        i += 1
    return "".join(out)


_STRFTIME_TOKENS = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
}


def _rewrite_strftime(sql: str) -> str:
    """strftime(ts, '%Y-%m-%d') → date_format(ts, 'yyyy-MM-dd') for the
    C-style tokens with Java-format equivalents; calls using tokens outside
    the table are left alone (better a Spark parse error than a silently
    different format)."""
    pat = re.compile(r"\bstrftime\s*\(", re.IGNORECASE)
    for m in reversed(list(pat.finditer(sql))):
        open_paren = sql.index("(", m.start())
        close = _scan_balanced(sql, open_paren)
        args = _split_top_level_commas(sql[open_paren + 1 : close - 1])
        if len(args) != 2:
            continue
        fmt = args[1].strip()
        if not (fmt.startswith("'") and fmt.endswith("'")):
            continue
        body = fmt[1:-1]
        for tok, java in _STRFTIME_TOKENS.items():
            body = body.replace(tok, java)
        if "%" in body:
            continue  # untranslated token — leave the call untouched
        sql = (
            sql[: m.start()]
            + f"date_format({args[0]}, '{body}')"
            + sql[close:]
        )
    return sql


def _rewrite_string_split(sql: str) -> str:
    """string_split(x, 'sep') → split(x, '<regex-escaped sep>'). Spark's
    split() takes a REGEX; DuckDB's separator is literal, so '.' or '|'
    must be escaped before the swap (only simple literal separators are
    rewritten)."""
    pat = re.compile(r"\bstring_split\s*\(", re.IGNORECASE)
    for m in reversed(list(pat.finditer(sql))):
        open_paren = sql.index("(", m.start())
        close = _scan_balanced(sql, open_paren)
        args = _split_top_level_commas(sql[open_paren + 1 : close - 1])
        if len(args) != 2:
            continue
        sep = args[1].strip()
        if not (sep.startswith("'") and sep.endswith("'")):
            continue
        escaped = re.escape(sep[1:-1]).replace("\\", "\\\\")
        sql = (
            sql[: m.start()]
            + f"split({args[0]}, '{escaped}')"
            + sql[close:]
        )
    return sql


def rewrite_duckdb_sql(sql: str) -> str:
    sql = _escape_backslashes_in_literals(sql)
    out = _rewrite_qualify(sql)
    out = _rewrite_distinct_on(out)
    out = _rewrite_date_trunc(out)
    out = _rewrite_strftime(out)
    out = _rewrite_string_split(out)
    out = re.sub(r"\bepoch_us\s*\(", "unix_micros(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bepoch_ms\s*\(", "unix_millis(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bepoch\s*\(", "unix_timestamp(", out, flags=re.IGNORECASE)
    out = re.sub(
        r"::\s*TIMESTAMPTZ\s+AT\s+TIME\s+ZONE\s+'UTC'",
        "::TIMESTAMP",
        out,
        flags=re.IGNORECASE,
    )
    out = re.sub(r"::\s*TIMESTAMPTZ\b", "::TIMESTAMP", out, flags=re.IGNORECASE)
    out = re.sub(r"::\s*TEXT\b", "::STRING", out, flags=re.IGNORECASE)
    out = re.sub(r"\bregexp_matches\s*\(", "regexp_like(", out, flags=re.IGNORECASE)
    out = re.sub(r"\barg_max\s*\(", "max_by(", out, flags=re.IGNORECASE)
    out = re.sub(r"\barg_min\s*\(", "min_by(", out, flags=re.IGNORECASE)
    out = re.sub(r"\blist\s*\(", "collect_list(", out, flags=re.IGNORECASE)
    out = re.sub(r"\blist_sort\s*\(", "array_sort(", out, flags=re.IGNORECASE)
    out = re.sub(
        r"\blist_contains\s*\(", "array_contains(", out, flags=re.IGNORECASE
    )
    # DuckDB star-EXCLUDE → Spark star-EXCEPT (anchored to a preceding `*`
    # so EXCEPT-the-set-operation is never touched). GROUP BY ALL /
    # ORDER BY ALL / `* EXCEPT (...)` itself are Spark-native and pass
    # through; star-REPLACE has no schema-free Spark equivalent.
    out = re.sub(
        r"(\*\s*)EXCLUDE\s*\(", r"\1EXCEPT (", out, flags=re.IGNORECASE
    )
    out = re.sub(
        r"(\*\s*)EXCLUDE\s+(\w+)", r"\1EXCEPT (\2)", out, flags=re.IGNORECASE
    )
    out = _rewrite_string_agg(out)
    out = re.sub(
        r"EXTRACT\s*\(\s*EPOCH\s+FROM\s*\(([^()]*)-([^()]*)\)\s*\)",
        r"(unix_timestamp(\1) - unix_timestamp(\2))",
        out,
        flags=re.IGNORECASE,
    )
    return out


def register_raw_tables(
    spark: SparkSession, data_dir: str, obs_view: str = "observations",
    fcst_view: str = "forecasts"
) -> None:
    """Register the /raw tables the way the browser page does
    (raw_data.js:199-218): every snapshot file union_by_name'd into one
    table per kind — here via the schema-merging reader, so raw SQL runs
    against complete canonical columns."""
    cat = SnapshotCatalog(data_dir)
    read_snapshots(
        spark, cat.all_paths("observations"), "observations"
    ).createOrReplaceTempView(obs_view)
    read_snapshots(
        spark, cat.all_paths("forecasts"), "forecasts"
    ).createOrReplaceTempView(fcst_view)


def run_raw_sql(spark: SparkSession, sql: str):
    """Run DuckDB-dialect SQL against the registered raw views."""
    return spark.sql(rewrite_duckdb_sql(sql))
