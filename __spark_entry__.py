"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in noaa_oracle_spark/suite.py (SURVEY §2 operator
families) and noaa_oracle_spark/suite_pipeline.py (training-data pipeline
operators); this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from noaa_oracle_spark.suite import ORACLE_SQL, QUERIES, q01_daily_rollup  # noqa: E402
from noaa_oracle_spark.suite_pipeline import (  # noqa: E402
    PIPELINE_ORACLE_SQL,
    PIPELINE_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q01_daily_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + pipeline ops."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(QUERIES)
    out.update(PIPELINE_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per queries() key."""
    out: dict[str, str] = {}
    out.update(ORACLE_SQL)
    out.update(PIPELINE_ORACLE_SQL)
    return out
