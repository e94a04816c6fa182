"""Round-13 staged gate debuts (q141_codebook_drift — the one debut the
~150 gate budget allows this round), oracle-checked ahead of their
window rotation — the same pre-promotion discipline q129–q138 followed:
the queries are NOT in __spark_entry__.queries() yet (a new name outside
the r12 window would trip the staleness invariant), but they already
hash-match their DuckDB oracles at sf0.001 AND sf0.01 here, so the r13
promotion is a dict move, not new code."""

from __future__ import annotations

import pytest

from noaa_oracle_spark.suite_pipeline import (
    PIPELINE_ORACLE_SQL_STAGED_R13,
    PIPELINE_QUERIES_STAGED_R13,
)

from test_suite_oracle import duck_con, normalize

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_staged_dicts_aligned():
    assert set(PIPELINE_QUERIES_STAGED_R13) == set(
        PIPELINE_ORACLE_SQL_STAGED_R13
    )
    # staged names must NOT already be live gate queries
    import __spark_entry__ as entry

    live = set(entry.queries())
    assert not live & set(PIPELINE_QUERIES_STAGED_R13)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES_STAGED_R13))
def test_staged_matches_oracle(spark, name, sf_dir):
    sdf = PIPELINE_QUERIES_STAGED_R13[name](spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    con = duck_con(sf_dir)
    res = con.execute(PIPELINE_ORACLE_SQL_STAGED_R13[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        name, spark_cols, duck_cols,
    )
    assert len(spark_rows) == len(duck_rows), name
    assert normalize(
        [tuple(r) for r in spark_rows], spark_cols
    ) == normalize(duck_rows, duck_cols), name
