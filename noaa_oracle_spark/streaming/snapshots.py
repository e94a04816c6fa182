"""Structured Streaming over the snapshot store.

The reference is batch-only: an hourly cron loop appends snapshot files and
queries recompute over the selected file set (daemon/src/main.rs:63-74;
SURVEY §2.10) — plain batch recompute reproduces its semantics exactly. This
module is the *forward-looking* streaming path the reference lacks: the same
snapshot tree consumed incrementally as a file-source stream, with

  - streaming_daily_observations: watermarked windowed rollup (A4 as a
    stream) — late snapshots within the watermark still update their day;
  - streaming_latest_forecasts: latest-generated_at-wins dedup (D1) as a
    custom *stateful* operator via applyInPandasWithState, since
    dropDuplicates keeps the FIRST arrival but snapshot-upsert semantics
    need the freshest.

At scale the file source lists only new files per microbatch (checkpointed),
so an hourly snapshot drop costs one file's read — the incremental analog of
the batch path's partition pruning.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from noaa_oracle_spark.schemas import FORECASTS_SCHEMA, OBSERVATIONS_SCHEMA

_KIND_SCHEMAS = {
    "observations": OBSERVATIONS_SCHEMA,
    "forecasts": FORECASTS_SCHEMA,
}


def stream_snapshots(
    spark: SparkSession, data_dir: str, kind: str
) -> DataFrame:
    """File-source stream over `{data_dir}/*/{kind}_*.parquet`."""
    if kind not in _KIND_SCHEMAS:
        raise ValueError(f"unknown snapshot kind: {kind!r}")
    return (
        spark.readStream.schema(_KIND_SCHEMAS[kind])
        .option("pathGlobFilter", f"{kind}_*.parquet")
        .parquet(f"{data_dir}/*")
    )


def streaming_daily_observations(
    observations: DataFrame, watermark: str = "1 day"
) -> DataFrame:
    """Watermarked per-station daily rollup — the streaming twin of
    queries.weather.daily_observations' aggregate core. Late observation
    rows within the watermark still fold into their day bucket; beyond it
    state is dropped (bounded memory on an unbounded stream)."""
    t = F.col("temperature_value")
    w = F.col("wind_speed")
    ts = F.to_timestamp("generated_at")
    return (
        observations.withColumn("obs_ts", ts)
        .withWatermark("obs_ts", watermark)
        .groupBy("station_id", F.window("obs_ts", "1 day").alias("day_window"))
        .agg(
            F.min(t).alias("temp_low"),
            F.max(t).alias("temp_high"),
            F.max(F.when(w.isNotNull() & (w >= 0) & (w <= 500), w)).alias(
                "wind_speed"
            ),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .select(
            "station_id",
            F.date_format(F.col("day_window.start"), "yyyy-MM-dd").alias("date"),
            "temp_low",
            "temp_high",
            "wind_speed",
            "n_obs",
        )
    )


_LATEST_STATE_SCHEMA = T.StructType(
    [T.StructField("generated_at", T.StringType(), True)]
)

_LATEST_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("station_id", T.StringType(), False),
        T.StructField("begin_time", T.StringType(), True),
        T.StructField("end_time", T.StringType(), True),
        T.StructField("generated_at", T.StringType(), True),
        T.StructField("max_temp", T.LongType(), True),
        T.StructField("min_temp", T.LongType(), True),
        T.StructField("wind_speed", T.LongType(), True),
    ]
)


def _latest_wins(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: per (station, begin, end) remember the freshest
    generated_at seen; emit a row only when a fresher forecast arrives.
    RFC3339 strings compare lexicographically as instants within one offset,
    matching the batch dedup's ORDER BY generated_at DESC."""
    best: str | None = state.get[0] if state.exists else None
    newest: dict[str, Any] | None = None
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            g = row["generated_at"]
            if best is None or (g is not None and g > best):
                best = g
                newest = row.to_dict()
    if newest is not None:
        state.update((best,))
        yield pd.DataFrame(
            [
                {
                    "station_id": key[0],
                    "begin_time": key[1],
                    "end_time": key[2],
                    "generated_at": newest["generated_at"],
                    "max_temp": newest["max_temp"],
                    "min_temp": newest["min_temp"],
                    "wind_speed": newest["wind_speed"],
                }
            ]
        )


def streaming_latest_forecasts(forecasts: DataFrame) -> DataFrame:
    """Latest-wins forecast dedup as a custom stateful streaming operator
    (applyInPandasWithState) — snapshot-upsert semantics (D1) on a stream."""
    return (
        forecasts.select(
            "station_id", "begin_time", "end_time", "generated_at",
            "max_temp", "min_temp", "wind_speed",
        )
        .groupBy("station_id", "begin_time", "end_time")
        .applyInPandasWithState(
            _latest_wins,
            outputStructType=_LATEST_OUTPUT_SCHEMA,
            stateStructType=_LATEST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
