"""As-of join: for each left row, the most recent right row with
right.ts <= left.ts per key — the canonical time-series enrichment join.

The reference has no as-of join (SURVEY §2.4: equi-joins only); its
closest relative is the carry-forward fill (W3,
crates/daemon/src/domains/forecasts/download_forecast.rs:622-805), which is
exactly an as-of join of a grid against sparse readings. This operator
generalizes that shape for the pipeline surface.

Spark-first formulation: Spark has no ASOF JOIN physical operator, and the
naive range join (`l.key = r.key AND r.ts <= l.ts` + argmax) explodes to a
BroadcastNestedLoop or an O(n·m) range join. Instead: UNION both sides,
one window sort per key, `last(value, ignorenulls=True)` carries the
latest right payload to each left row. One shuffle on the key, zero pair
explosion — the join cost is a sort, identical asymptotics to the engine's
carry-forward operator, and it survives 100 TB because the window
partitions on the join key (salt high-cardinality-skewed keys upstream if
one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """Backward inclusive as-of join (ts >= semantics, LEFT outer).

    Requirements mirrored by any SQL oracle: `right` must be unique per
    (keys, right_ts) — with duplicates, "the" most recent right row is
    ambiguous in every engine; dedup upstream (e.g. keep max id).

    Output: every left row + `right_cols` (renamed `prefix`+name), NULL
    where no right row precedes."""
    reserved = {"_asof_ts", "_asof_side", "_asof_payload", "_asof_match"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"asof_join: reserved column names in input: {clash}")
    payload = F.struct(
        *[F.col(c).alias(c) for c in right_cols]
    ).alias("_asof_payload")
    right_prep = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        payload,
    )
    left_prep = left.select(
        "*",
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
    )
    # right rows sort BEFORE a left row at equal ts (side 0 < 1) → inclusive
    u = left_prep.unionByName(right_prep, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_asof_match.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return carried.filter(F.col("_asof_side") == 1).select(*out_cols)
