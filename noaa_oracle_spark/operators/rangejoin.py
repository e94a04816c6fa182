"""Binned range join: pair rows whose timestamps fall within a window of
each other WITHOUT an equi-key — the join family Spark plans as a
BroadcastNestedLoop (O(n·m)) if written naively.

The reference has no range join (SURVEY §2.4: equi-joins only); this is a
pipeline-surface operator (co-occurrence counting, sessionized attribution,
sensor alignment).

Scale path: quantize the time axis into `window` buckets. A right row lands
in exactly one bucket; a left row's window [ts−w, ts] can only intersect
buckets {b−1, b}, so the left side explodes ×2 onto those keys and the join
becomes an EQUI-join on the bucket id — shuffle-partitioned, AQE-skew-
splittable, pair volume bounded by bucket occupancy instead of n·m. The
exact predicate then filters the candidates. This is the standard
bucketized interval join (the same trick DuckDB/Trino apply internally to
range predicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts_us: str,
    right_ts_us: str,
    window_us: int,
) -> DataFrame:
    """Inner-join pairs where right.ts ∈ [left.ts − window_us, left.ts].

    Inputs carry integer microsecond columns (cast upstream — integer bin
    arithmetic is engine-portable; interval/timezone math is not). Output:
    all left columns + all right columns (caller aliases collisions away
    upstream)."""
    if "_bin" in left.columns or "_bin" in right.columns:
        raise ValueError("binned_range_join: input already has a _bin column")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"binned_range_join: alias away shared columns first: {overlap}"
        )
    # integer `div` — float division near bin boundaries is a correctness
    # trap (a right row binned one bucket late is silently unmatched)
    bin_l = F.expr(f"{left_ts_us} div {window_us}")
    bin_r = F.expr(f"{right_ts_us} div {window_us}")
    lx = left.withColumn(
        "_bin", F.explode(F.array(bin_l - 1, bin_l))
    )
    rx = right.withColumn("_bin", bin_r)
    lo = F.col(left_ts_us) - F.lit(window_us)
    return (
        lx.join(rx, "_bin")
        .filter(
            (F.col(right_ts_us) >= lo)
            & (F.col(right_ts_us) <= F.col(left_ts_us))
        )
        .drop("_bin")
    )
