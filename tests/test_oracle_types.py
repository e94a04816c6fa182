"""Regression guard: no oracle SQL may emit an Arrow decimal/hugeint column.

Round-1 driver hash-fails (q07, q12, q15, q26, q42, q56, plus latent q48,
q63, q64) were all caused by DuckDB ``SUM(BIGINT)`` returning HUGEINT
(Arrow ``decimal128(38, 0)``) while Spark returns bigint — the driver's
value hasher is type-sensitive, so byte-identical values still mismatched.
Every such aggregate must be wrapped in ``CAST(... AS BIGINT)`` in the
oracle SQL. This test runs every oracle at sf0.001 and fails if any output
column is an Arrow decimal type.
"""

from __future__ import annotations

import duckdb
import pytest

from noaa_oracle_spark.suite import ORACLE_SQL
from noaa_oracle_spark.suite_pipeline import PIPELINE_ORACLE_SQL

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


ALL_SQL = {**ORACLE_SQL, **PIPELINE_ORACLE_SQL}


@pytest.mark.parametrize("name", sorted(ALL_SQL))
def test_oracle_emits_no_decimal_columns(con, name):
    schema = con.execute(ALL_SQL[name]).arrow().schema
    decimals = [
        (f.name, str(f.type)) for f in schema if "decimal" in str(f.type)
    ]
    assert not decimals, (
        f"{name}: oracle emits Arrow decimal column(s) {decimals}; "
        "wrap the aggregate in CAST(... AS BIGINT) — the driver's hasher "
        "is type-sensitive and will record hash_match=false"
    )
