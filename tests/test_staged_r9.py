"""Mirror tests for the round-9 STAGED gate queries (r7 verdict ask #4):
q129 BM25 retrieval and q130 crawl-URL provenance are pre-verified
against their DuckDB oracles here, and are deliberately NOT in
PIPELINE_QUERIES yet — round 8's grading window has zero new-gate
capacity.  Round 9 moves them into the main dicts + window front."""

from __future__ import annotations

from noaa_oracle_spark.suite_pipeline import (
    PIPELINE_ORACLE_SQL,
    PIPELINE_ORACLE_SQL_STAGED_R9,
    PIPELINE_QUERIES,
    PIPELINE_QUERIES_STAGED_R9,
)

import pytest

from tests.test_suite_oracle import SF_DIR, duck_con, normalize


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES_STAGED_R9))
def test_staged_query_matches_oracle(spark, name):
    sdf = PIPELINE_QUERIES_STAGED_R9[name](spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    con = duck_con(SF_DIR)
    res = con.execute(PIPELINE_ORACLE_SQL_STAGED_R9[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), name
    assert normalize(
        [tuple(r) for r in spark_rows], spark_cols
    ) == normalize(duck_rows, duck_cols), name


def test_staged_not_yet_gates():
    """Staging must not leak into the graded surface before r9."""
    for name in PIPELINE_QUERIES_STAGED_R9:
        assert name not in PIPELINE_QUERIES
        assert name not in PIPELINE_ORACLE_SQL
