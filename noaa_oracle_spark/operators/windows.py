"""Window operators: interval chaining and carry-forward fill (SURVEY §2.6).

- with_lead: `LEAD(begin_ts) OVER (PARTITION BY ... ORDER BY begin_ts)` used
  to detect contiguous forecast windows (`end_ts = next_begin`,
  weather_data.rs:259-263).
- carry_forward: the ETL's imperative pull-last-seen-value-forward for
  non-accumulative fields (download_forecast.rs:622-805) expressed as
  `last(col, ignorenulls=True)` over an unbounded-preceding running frame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_lead(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    alias: str = "next_value",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(alias, F.lead(col).over(w))


def carry_forward(
    df: DataFrame,
    cols: Sequence[str],
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
) -> DataFrame:
    """Fill NULLs in `cols` with the most recent non-NULL value within each
    partition. Accumulative fields (precip amounts) must NOT be carried —
    the reference is explicit about that (download_forecast.rs:636-647);
    callers simply exclude them from `cols`."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
