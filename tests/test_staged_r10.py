"""Round-10 staged gate debuts (q133–q136), oracle-checked ahead of their
window rotation — the same pre-promotion discipline q129–q132 followed
through round 8: the queries are NOT in __spark_entry__.queries() yet (a
new name outside the r9 window would trip the staleness invariant), but
they already hash-match their DuckDB oracles at sf0.001 AND sf0.01 here,
so the r10 promotion is a dict move, not new code."""

from __future__ import annotations

import pytest

from noaa_oracle_spark.suite_pipeline import (
    PIPELINE_ORACLE_SQL_STAGED_R10,
    PIPELINE_QUERIES_STAGED_R10,
)

from test_suite_oracle import duck_con, normalize

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_staged_dicts_aligned():
    assert set(PIPELINE_QUERIES_STAGED_R10) == set(
        PIPELINE_ORACLE_SQL_STAGED_R10
    )
    # staged names must NOT already be live gate queries
    import __spark_entry__ as entry

    live = set(entry.queries())
    assert not live & set(PIPELINE_QUERIES_STAGED_R10)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES_STAGED_R10))
def test_staged_matches_oracle(spark, name, sf_dir):
    sdf = PIPELINE_QUERIES_STAGED_R10[name](spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    con = duck_con(sf_dir)
    res = con.execute(PIPELINE_ORACLE_SQL_STAGED_R10[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} "
        f"duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns = normalize([tuple(r) for r in spark_rows], spark_cols)
    nd = normalize(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(ns, nd)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES_STAGED_R10))
def test_staged_plan_audit(spark, name):
    """The whole-suite physical-plan invariants (test_plan_audit) applied
    to the staged debuts BEFORE promotion — a staged gate must never
    rotate in carrying a plan shape the audit would flag."""
    from test_plan_audit import (
        FORBIDDEN,
        _unbounded_global_windows,
    )

    df = PIPELINE_QUERIES_STAGED_R10[name](spark, "/root/testdata/sf0.001")
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    hits = [op for op in FORBIDDEN if op in plan]
    assert not hits, f"{name}: forbidden physical operators {hits}"
    windows = _unbounded_global_windows(qe.executedPlan())
    assert not windows, (
        f"{name}: empty-partition WindowExec over unbounded input: "
        f"{windows}"
    )
