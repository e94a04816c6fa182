"""suite.load must tolerate every timestamp storage shape the driver's
testdata generator has produced across rounds:

  - TIMESTAMP(isAdjustedToUTC=true)  → Spark TimestampType (original shape)
  - TIMESTAMP(NANOS)                 → int64 via nanosAsLong, floor-div to µs
  - TIMESTAMP(isAdjustedToUTC=false) → TIMESTAMP_NTZ (current shape; Spark 4
    infers NTZ, which unix_micros()/window() reject)

All three must load to a plain TimestampType column holding the same UTC
instants, so every downstream query (unix_micros, date_trunc, window) works
regardless of which generation of testdata is on disk."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from noaa_oracle_spark.suite import load

INSTANTS = [
    dt.datetime(2024, 3, 1, 0, 0, 0),
    dt.datetime(2024, 3, 1, 23, 59, 59, 123456),
    dt.datetime(2024, 12, 31, 12, 0, 0),
]


def _write_events(tmpdir: str, ts_type: pa.DataType) -> str:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(INSTANTS).cast(ts_type),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["a", "b", "a"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
        }
    )
    pq.write_table(tbl, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.mark.parametrize(
    "ts_type",
    [
        pa.timestamp("us", tz="UTC"),
        pa.timestamp("us"),
        pa.timestamp("ns"),
    ],
    ids=["utc-adjusted", "ntz", "nanos"],
)
def test_load_normalizes_timestamp_shape(spark, tmp_path, ts_type):
    from pyspark.sql import functions as F

    d = _write_events(str(tmp_path), ts_type)
    df = load(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes
    got = [
        r[0]
        for r in df.select(F.unix_micros("ts").alias("us"))
        .orderBy("us")
        .collect()
    ]
    want = sorted(
        int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        for t in INSTANTS
    )
    assert got == want
