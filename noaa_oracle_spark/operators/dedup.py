"""DISTINCT ON — rank-1-per-group dedup (SURVEY §2.3).

DuckDB's `SELECT DISTINCT ON (keys) ... ORDER BY keys, ord` keeps the first
row per key group (weather_data.rs:213-235 latest-forecast dedup;
:267-305 argmax-by-ratio duration pick). Spark-first: a row_number window
over (partitionBy keys, orderBy ord) filtered to 1.

Determinism note (SURVEY §7 risk 2): DuckDB's pick is arbitrary beyond the
declared sort keys; callers here must pass a *total* order (append a unique
tiebreaker) so results are stable and hash-comparable.

Scale: one shuffle on the dedup keys. When a downstream aggregation groups by
a prefix of the same keys, Catalyst reuses the exchange; AQE handles skewed
stations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distinct_on(
    df: DataFrame,
    keys: Sequence[str | Column],
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep the first row per `keys` group under `order_by`."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
