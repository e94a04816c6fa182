"""Value-capped sessionization: gap closes, cap closes, cross-microbatch
state continuity, and watermark-timeout flush."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from noaa_oracle_spark.streaming.sessions import value_capped_sessions

T0 = dt.datetime(2026, 1, 15, 12, 0, 0)


def _write(path, name, rows):
    tbl = pa.table(
        {
            "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
            "ts": pa.array(
                [T0 + dt.timedelta(seconds=s) for _, s, _ in rows],
                pa.timestamp("us"),
            ),
            "value": pa.array([v for _, _, v in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(path, f"{name}.parquet"))


def test_gap_and_cap_sessions(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # user 1: two events close together, then a 60 s gap → first session
    #   closes by GAP when the third event arrives.
    # user 2: values 3 + 3 under cap 5 → second event opens a new session,
    #   first closes by VALUE_CAP.
    _write(src, "b1", [(1, 0, 1.0), (1, 2, 1.0), (2, 0, 3.0), (2, 1, 3.0)])
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = value_capped_sessions(stream, gap_seconds=10, value_cap=5.0)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("vc_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: user 1's event at +60 s closes the open session
        _write(src, "b2", [(1, 60, 2.0)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM vc_sessions ORDER BY user_id, session_start_us"
        ).collect()
    finally:
        q.stop()

    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)

    u1 = by_user[1]
    assert len(u1) == 1
    assert u1[0].close_reason == "gap"
    assert u1[0].n_events == 2 and u1[0].total_value == 2.0
    assert (u1[0].session_end_us - u1[0].session_start_us) == 2_000_000

    u2 = by_user[2]
    assert len(u2) == 1
    assert u2[0].close_reason == "value_cap"
    assert u2[0].n_events == 1 and u2[0].total_value == 3.0
