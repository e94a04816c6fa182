"""Bucketed snapshot tables — the co-located-join layout for 100 TB
(SURVEY §7 Phase 5: "date partitioning + station bucketing").

Every heavy join and rollup in the engine keys on `station_id` (forecast ⋈
observation daily comparison, dedup windows, scoring lookups — SURVEY §2.4).
Writing both sides bucketed by that key into the same bucket count makes the
join a zip of pre-shuffled files: Spark's scan reports the hash distribution
and Catalyst drops the Exchange on BOTH sides, so the only remaining cost is
the per-bucket sort (eliminated too when the data is written sortBy the join
key and each bucket holds one file).

Shuffle math at scale: an hourly forecast snapshot is ~600 k rows; a year of
them joined to observations shuffles ~5 G rows per query without bucketing —
with it, zero. The bucket count is a layout constant (pick ~2× target
cluster cores; AQE cannot re-bucket a table, so it is the one knob decided
at write time, not query time).

The table metadata (bucket spec) lives in the session catalog; production
deployments point the session at a persistent metastore, tests use the
session-local one. Files are written to an explicit `path`, so the tables
are external — dropping them never deletes data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as an external parquet table bucketed (and optionally
    sorted) by the join/aggregation key."""
    w = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def colocated(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (plain `read.parquet` on
    the path would LOSE the bucket spec — the distribution is metadata)."""
    return spark.table(table)
