"""Streaming KMV sketch: the running estimate after N microbatches must
EQUAL the batch kmv_distinct over the union of all batches — the
mergeability property made executable."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.sketches import kmv_distinct
from noaa_oracle_spark.streaming.sketches import streaming_kmv_distinct

ELEM_SCHEMA = "g string, e string"


def _write_batch(path, name, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "g": pa.array([g for g, _ in rows]),
            "e": pa.array([e for _, e in rows]),
        }
    )
    pq.write_table(tbl, os.path.join(path, f"{name}.parquet"))


def _latest_per_group(spark, qname):
    # update-mode memory sink keeps every emission; KMV state is
    # MONOTONE (distinct count only grows, so the k-th minimum only
    # shrinks and both n_sketch and the estimate only rise) — the
    # latest sketch per group is therefore the max by (n_sketch, est)
    rows = spark.sql(
        f"SELECT * FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY group ORDER BY n_sketch DESC, kmv_distinct DESC) "
        f"rn FROM {qname}) WHERE rn = 1"
    ).collect()
    return {r.group: (r.n_sketch, r.kmv_distinct) for r in rows}


def test_streaming_kmv_equals_batch_over_union(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = [("a", f"x{i}") for i in range(400)] + [
        ("b", f"y{i}") for i in range(30)
    ]
    b2 = [("a", f"x{i}") for i in range(200, 700)] + [
        ("b", f"y{i}") for i in range(10, 50)
    ]
    _write_batch(src, "b1", b1)

    stream = (
        spark.readStream.schema(ELEM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    est = streaming_kmv_distinct(stream, "g", "e", k=64)
    q = (
        est.writeStream.outputMode("update")
        .format("memory")
        .queryName("kmv_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        mid = _latest_per_group(spark, "kmv_stream")
        _write_batch(src, "b2", b2)
        q.processAllAvailable()
        final = _latest_per_group(spark, "kmv_stream")
    finally:
        q.stop()

    def batch_est(rows):
        df = spark.createDataFrame(rows, ELEM_SCHEMA)
        return {
            r.g: (r.n_sketch, r.kmv_distinct)
            for r in kmv_distinct(df, ["g"], F.col("e"), k=64).collect()
        }

    want_mid, want_final = batch_est(b1), batch_est(b1 + b2)
    for got, want in ((mid, want_mid), (final, want_final)):
        # EXACT equality: same integer hash math, and the kernel's
        # HALF_UP decimal quantize reproduces F.round bit-for-bit
        assert got == want
    # group b stays below k in batch 1 (exact regime), crosses later
    assert mid["b"][0] == 30 and mid["b"][1] == 30.0
    assert final["a"][0] == 64  # estimator regime for the big group


def test_streaming_kmv_state_is_bottom_k_only(spark, tmp_path):
    """Replaying the same batch twice changes nothing (idempotent merge),
    and n_sketch never exceeds k."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [("g1", f"v{i}") for i in range(500)]
    _write_batch(src, "b1", rows)
    stream = (
        spark.readStream.schema(ELEM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    est = streaming_kmv_distinct(stream, "g", "e", k=32)
    q = (
        est.writeStream.outputMode("update")
        .format("memory")
        .queryName("kmv_idem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = _latest_per_group(spark, "kmv_idem")
        _write_batch(src, "b2", rows)  # identical content, new file
        q.processAllAvailable()
        second = _latest_per_group(spark, "kmv_idem")
    finally:
        q.stop()
    assert first == second
    assert second["g1"][0] == 32


def test_streaming_countmin_cells_via_native_aggregation(spark, tmp_path):
    """The module docstring's claim made executable: count-min cells are
    a plain (seed, bucket) SUM, so Structured Streaming's native
    update-mode aggregation maintains them with no custom operator —
    and the final cells equal the batch countmin_cells over the union
    of all microbatches."""
    import os

    from pyspark.sql import functions as F

    from noaa_oracle_spark.pipeline.sketches import countmin_cells

    d, w = 3, 16
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = [("t1", 5), ("t2", 3), ("t3", 9)]
    b2 = [("t1", 2), ("t4", 7)]

    def write(name, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "term": pa.array([t for t, _ in rows]),
                    "n": pa.array([n for _, n in rows], pa.int64()),
                }
            ),
            os.path.join(src, f"{name}.parquet"),
        )

    write("b1", b1)
    write("b2", b2)
    stream = (
        spark.readStream.schema("term string, n long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # the cell build IS countmin_cells' expression tree — reused verbatim
    # on the streaming frame; the groupBy sum runs as a native stateful
    # aggregation in update mode
    cells = countmin_cells(stream, count_col="n", d=d, w=w)
    q = (
        cells.writeStream.outputMode("update")
        .format("memory")
        .queryName("cms_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update-mode sink: latest emission per (seed, bucket) = max count
    # (cells only grow)
    got = {}
    for r in spark.sql("SELECT * FROM cms_stream").collect():
        key = (r.seed, r.bucket)
        got[key] = max(got.get(key, 0), r.cell_count)
    union = spark.createDataFrame(b1 + b2, "term string, n long")
    want = {
        (r.seed, r.bucket): r.cell_count
        for r in countmin_cells(union, count_col="n", d=d, w=w).collect()
    }
    assert got == want


def test_streaming_countmin_equals_batch_over_union(spark, tmp_path):
    """Streaming CMS twin: after N microbatches the latest cell table
    equals the batch countmin_cells over the union of all batches, and
    point estimates through the shared countmin_estimate agree."""
    from noaa_oracle_spark.pipeline.sketches import (
        countmin_cells,
        countmin_estimate,
    )
    from noaa_oracle_spark.streaming.sketches import streaming_countmin_cells

    src = str(tmp_path / "cms_src")
    os.makedirs(src)
    b1 = [("g", f"t{i % 7}") for i in range(300)]
    # NULL terms included: batch concat_ws SKIPS NULLs (seed-only cell),
    # and the streaming twin must land them in the same cell (r7 review)
    b2 = [("g", f"t{i % 19}") for i in range(500)] + [("g", None)] * 3
    _write_batch(src, "b1", b1)
    _write_batch(src, "b2", b2)

    stream = (
        spark.readStream.schema(ELEM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cells = streaming_countmin_cells(stream, "e", d=3, w=64)
    q = (
        cells.writeStream.outputMode("update")
        .format("memory")
        .queryName("cms_stream")
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update-mode memory sink keeps every emission; CMS cells are
    # MONOTONE (counts only grow) — latest per cell = max
    got = {
        (r.seed, r.bucket): r.cell_count
        for r in spark.sql(
            "SELECT seed, bucket, max(cell_count) cell_count "
            "FROM cms_stream GROUP BY seed, bucket"
        ).collect()
    }

    union = spark.createDataFrame(b1 + b2, ELEM_SCHEMA)
    type_counts = union.groupBy(F.col("e").alias("term")).agg(
        F.count("*").alias("n")
    )
    batch_cells = countmin_cells(type_counts, d=3, w=64)
    want = {
        (r.seed, r.bucket): r.cell_count for r in batch_cells.collect()
    }
    assert got == want

    # point estimates through the SHARED estimator agree too (incl. an
    # unseen probe -> 0)
    probes = spark.createDataFrame(
        [("t0",), ("t18",), ("never",)], "term string"
    )
    got_cells_df = spark.createDataFrame(
        [(s, b, c) for (s, b), c in sorted(got.items())],
        "seed int, bucket long, cell_count long",
    )
    est_stream = {
        r.term: r.cms_estimate
        for r in countmin_estimate(got_cells_df, probes, d=3, w=64).collect()
    }
    est_batch = {
        r.term: r.cms_estimate
        for r in countmin_estimate(batch_cells, probes, d=3, w=64).collect()
    }
    assert est_stream == est_batch
    assert est_stream["never"] == 0


def test_streaming_kmv_sample_equals_batch_over_union(spark, tmp_path):
    """Streaming uniform-sample twin: after each microbatch the latest
    per-group emission equals batch kmv_sample over the union of all
    delivered rows (same ids, same values)."""
    from noaa_oracle_spark.pipeline.sketches import kmv_sample
    from noaa_oracle_spark.streaming.sketches import streaming_kmv_sample

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "smp_src")
    os.makedirs(src)

    def write(name, rows):
        pq.write_table(
            pa.table(
                {
                    "g": pa.array([g for g, _, _ in rows]),
                    "id": pa.array(
                        [i for _, i, _ in rows], type=pa.int64()
                    ),
                    "v": pa.array([v for _, _, v in rows]),
                }
            ),
            os.path.join(src, f"{name}.parquet"),
        )

    b1 = [("a", i, float(i)) for i in range(300)]
    b2 = [("a", i, float(i)) for i in range(300, 800)] + [
        ("b", i, float(-i)) for i in range(40)
    ]
    write("b1", b1)
    write("b2", b2)

    stream = (
        spark.readStream.schema("g string, id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_kmv_sample(stream, "g", "id", "v", k=32)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("smp_stream")
        .option("checkpointLocation", str(tmp_path / "smp_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # the LATEST emission per group: KMV-sample state is monotone in the
    # hash order, so the final batch's rows are exactly the last emission;
    # dedupe by (group, id) keeping any occurrence then cut to the batch
    # answer directly
    union = spark.createDataFrame(b1 + b2, "g string, id long, v double")
    want = {
        g: sorted((r.id, r.v) for r in grp)
        for g, grp in (
            ("a", kmv_sample(union.filter("g='a'"), ["g"], "id", k=32).collect()),
            ("b", kmv_sample(union.filter("g='b'"), ["g"], "id", k=32).collect()),
        )
    }
    rows = spark.sql("SELECT * FROM smp_stream").collect()
    got: dict = {}
    # update sink keeps every emission; reconstruct the latest per group
    # as the bottom-32 of all emitted (id, value) pairs — emissions only
    # ever shrink toward the true bottom, so the union of emissions cut
    # to the final sample equals the last emission
    import hashlib

    def h60(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    for r in rows:
        got.setdefault(r.group, {})[r.id] = r.value
    final = {
        g: sorted(
            ((i, v) for i, v in pairs.items()),
            key=lambda t: h60(t[0]),
        )[:32]
        for g, pairs in got.items()
    }
    final = {g: sorted(pairs) for g, pairs in final.items()}
    assert final == want
    # group b arrived in one batch with < k rows: exact sample
    assert len(want["b"]) == 40 or len(want["b"]) == 32
