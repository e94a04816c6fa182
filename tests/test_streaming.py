"""Streaming smoke tests: drive the snapshot file-source stream to
completion with the memory sink (processAllAvailable) and check results,
including the stateful latest-wins operator across two microbatches.
"""

from __future__ import annotations

import pytest

from noaa_oracle_spark.streaming import (
    stream_snapshots,
    streaming_daily_observations,
    streaming_latest_forecasts,
)
from tests.weather_fixtures import (
    write_forecast_fixtures,
    write_observation_fixtures,
)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_weather"))
    write_observation_fixtures(d)
    write_forecast_fixtures(d)
    return d


def test_streaming_daily_observations(spark, stream_dir):
    obs = stream_snapshots(spark, stream_dir, "observations")
    assert obs.isStreaming
    agg = streaming_daily_observations(obs)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("daily_obs_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM daily_obs_stream ORDER BY station_id, date"
        ).collect()
    finally:
        q.stop()
    assert len(rows) >= 5
    katl = [r for r in rows if r["station_id"] == "KATL"]
    assert {r["date"] for r in katl} == {"2026-01-15", "2026-01-16"}
    d16 = next(r for r in katl if r["date"] == "2026-01-16")
    assert d16["temp_low"] == -1.0 and d16["n_obs"] == 2


def test_streaming_latest_forecasts(spark, stream_dir, tmp_path):
    """The stateful latest-wins operator: the re-forecast of KATL's 0-6h
    window (generated hour 3, qpf 0.12, max_temp 45) must supersede both the
    hour-0 original and the stale hour -1 duplicate."""
    fc = stream_snapshots(spark, stream_dir, "forecasts")
    dedup = streaming_latest_forecasts(fc)
    q = (
        dedup.writeStream.outputMode("update")
        .format("memory")
        .queryName("latest_fc_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM latest_fc_stream").collect()
    finally:
        q.stop()
    katl_0_6 = [
        r
        for r in rows
        if r["station_id"] == "KATL"
        and r["begin_time"] == "2026-01-15T00:00:00Z"
        and r["end_time"] == "2026-01-15T06:00:00Z"
    ]
    # update-mode memory sink appends each state change; the LAST emission
    # for the key must be the freshest forecast
    assert katl_0_6, "no emissions for the KATL 0-6h window"
    freshest = max(katl_0_6, key=lambda r: r["generated_at"])
    assert freshest["generated_at"] == "2026-01-15T03:00:00Z"
    assert freshest["max_temp"] == 45


def test_streaming_session_window(spark, tmp_path):
    """q37's claim, proven: the SAME session_window aggregation runs under
    readStream with watermarked state — batch/stream parity for the
    sessionization operator."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "events_stream"
    src.mkdir()
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                [
                    "2026-01-01 00:00:00",
                    "2026-01-01 00:10:00",  # same session (gap 10m < 30m)
                    "2026-01-01 02:00:00",  # new session
                    "2026-01-01 00:05:00",
                ]
            ),
        }
    )
    # pandas defaults to TIMESTAMP(NANOS), which the session reads as long
    pdf.to_parquet(
        src / "batch0.parquet",
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
    )
    agg = (
        stream.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("start"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            (r.user_id, str(r.start), r.n_events)
            for r in spark.sql("SELECT * FROM session_stream").collect()
        }
    finally:
        q.stop()
    assert rows == {
        (1, "2026-01-01 00:00:00", 2),
        (1, "2026-01-01 02:00:00", 1),
        (2, "2026-01-01 00:05:00", 1),
    }


def test_streaming_exact_dedup(spark, tmp_path):
    """The dedup ladder's first rung under Structured Streaming: duplicate
    texts arriving across micro-batches are suppressed by
    dropDuplicatesWithinWatermark on the content hash — state is bounded by
    the watermark horizon instead of growing forever."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "docs_stream"
    src.mkdir()

    def write_batch(name, rows):
        pd.DataFrame(rows).to_parquet(
            src / name, coerce_timestamps="us", allow_truncated_timestamps=True
        )

    t = pd.to_datetime("2026-01-01 00:00:00")
    write_batch("b0.parquet", {
        "doc_id": [1, 2],
        "text": ["alpha", "beta"],
        "ts": [t, t],
    })
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .withColumn("text_hash", F.md5("text"))
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: one duplicate text ("alpha"), one new
        write_batch("b1.parquet", {
            "doc_id": [3, 4],
            "text": ["alpha", "gamma"],
            "ts": [t, t],
        })
        q.processAllAvailable()
        rows = spark.sql("SELECT text FROM dedup_stream").collect()
    finally:
        q.stop()
    texts = sorted(r.text for r in rows)
    assert texts == ["alpha", "beta", "gamma"]
