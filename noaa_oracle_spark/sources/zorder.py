"""Z-order (Morton-curve) file layout for multi-dimensional pruning.

Why this exists at 100 TB: parquet row-group/file skipping works off per-file
min/max statistics, which only prune on columns the file layout is sorted
by. A linear sort on `station_id` gives perfect pruning on station and NONE
on time (every file spans the whole time range), and vice versa. Z-ordering
interleaves the bits of several columns' rank-buckets into one sort key, so
every file covers a small HYPER-RECTANGLE of the key space — a query box on
ANY subset of the z-columns intersects only O(box volume) files instead of
all of them. This is the same layout trick Delta/Iceberg `OPTIMIZE ZORDER
BY` applies; here it is a plain DataFrame transform + write.

Scale shape: one `approxQuantile` sampling pass to learn per-column bucket
boundaries (driver holds `2^bits` doubles per column, data never
collected), then a fully distributed `repartitionByRange` on the z-value
(range exchange = one shuffle, sampled boundaries) with
`sortWithinPartitions` so row-group stats inside each file are tight too.
The bit-interleave is a pure JVM expression tree (shifts/ands/ors) —
whole-stage-codegen'd, no UDF.

Reference tie-in: the snapshot store's date-directory layout
(crates/oracle/src/file_access.rs:96-129) is 1-D pruning on date;
z-ordering generalizes it to (station, time) and any other
frequently-co-filtered pair without changing readers — statistics-based
skipping is transparent.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, boundaries: list[float], bits: int) -> Column:
    """Map a numeric column to its quantile bucket id in [0, 2^bits) via
    width-free binary search over learned boundaries. `width_bucket` wants
    uniform widths, so use a fold over the sorted boundary list instead:
    bucket = Σ (x >= b_i). NULLs sort first (bucket 0)."""
    x = F.col(col).cast("double")
    terms = [F.when(x >= F.lit(b), 1).otherwise(0) for b in boundaries]
    return reduce(lambda a, b: a + b, terms, F.lit(0))


def _interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Morton-interleave k bucket ids of `bits` bits each into one long:
    output bit (i*k + j) = bit i of column j. Pure shift/and arithmetic —
    stays inside whole-stage codegen."""
    k = len(bucket_cols)
    parts = []
    for j, b in enumerate(bucket_cols):
        for i in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)),
                    i * k + j,
                )
            )
    return reduce(lambda a, c: a.bitwiseOR(c), parts)


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 8,
    rel_error: float = 0.01,
) -> DataFrame:
    """Append a `_zvalue` column: Morton code of the columns' quantile
    buckets. Quantile bucketing (not min/max linear scaling) makes the
    curve robust to skew — each bucket holds ~equal row counts, so hot
    keys cannot collapse the curve into a few cells."""
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    buckets = []
    for c in cols:
        boundaries = (
            df.select(F.col(c).cast("double").alias(c))
            .na.drop()
            .approxQuantile(c, qs, rel_error)
        )
        # dedupe (constant/low-cardinality cols repeat boundaries)
        boundaries = sorted(set(boundaries))
        buckets.append(_bucket_expr(c, boundaries, bits))
    return df.withColumn("_zvalue", _interleave(buckets, bits))


def write_zordered(
    df: DataFrame, path: str, cols: list[str], num_files: int,
    bits: int = 8,
) -> None:
    """Write `df` as `num_files` parquet files laid out along the Z-curve
    of `cols`. Range-partition on the z-value (so files own contiguous
    curve segments) and sort within partitions (so row-group stats are
    tight inside each file as well)."""
    z = zorder_value(df, cols, bits=bits)
    (
        z.repartitionByRange(num_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
