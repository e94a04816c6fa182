"""Streaming corpus dedup: first arrival of a text hash wins across
microbatches; the watermark variant bounds state and still dedups inside
the horizon."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from noaa_oracle_spark.streaming import stream_documents, streaming_exact_dedup

T0 = dt.datetime(2026, 1, 15, 12, 0, 0)


def _write_batch(spark, path, name, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _, _ in rows], pa.int64()),
            "text": [t for _, t, _ in rows],
            "lang": ["en"] * len(rows),
            "source": ["src"] * len(rows),
            "n_chars": pa.array([len(t) for _, t, _ in rows], pa.int64()),
            "ingest_ts": pa.array(
                [T0 + dt.timedelta(minutes=m) for _, _, m in rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(path, f"{name}.parquet"))


@pytest.mark.parametrize("use_watermark", [False, True])
def test_cross_microbatch_dedup(spark, tmp_path, use_watermark):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(
        spark, src, "b1", [(1, "alpha text", 0), (2, "beta text", 1)]
    )
    docs = stream_documents(spark, src)
    assert docs.isStreaming
    dedup = streaming_exact_dedup(
        docs, ts_col="ingest_ts" if use_watermark else None
    )
    qname = f"corpus_dedup_{use_watermark}"
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: doc 3 repeats doc 1's text, doc 4 is new
        _write_batch(
            spark, src, "b2", [(3, "alpha text", 5), (4, "gamma text", 6)]
        )
        q.processAllAvailable()
        rows = spark.sql(f"SELECT doc_id, text FROM {qname}").collect()
    finally:
        q.stop()
    assert sorted(r.doc_id for r in rows) == [1, 2, 4]
    assert all(len(r.text) > 0 for r in rows)
