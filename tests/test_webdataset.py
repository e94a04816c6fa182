"""WebDataset tar sharding: round-trip fidelity, determinism, shard
layout, and plan discipline (one binaryFile task per shard, blobs never
in a shuffle payload)."""

from __future__ import annotations

import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.multimodal import MEDIA_SCHEMA
from noaa_oracle_spark.pipeline.webdataset import (
    read_webdataset_shards,
    write_webdataset_shards,
)


def _media_rows(n):
    rows = []
    for i in range(n):
        blob = bytes([i % 251]) * (50 + i)
        kind = ("image", "audio", "video")[i % 3]
        mime = ("image/png", "audio/wav", "video/x-ppm-stream")[i % 3]
        rows.append(
            (i, kind, blob, mime, 8 + i, 6 + i, 1000 * i if kind == "video" else None)
        )
    return rows


@pytest.fixture()
def media(spark):
    return spark.createDataFrame(_media_rows(23), MEDIA_SCHEMA)


def test_round_trip_fidelity(spark, media, tmp_path):
    d = str(tmp_path / "wds")
    manifest = write_webdataset_shards(media, d, samples_per_shard=10)
    rows = manifest.collect()
    assert [r.shard_id for r in sorted(rows, key=lambda r: r.shard_id)] == [0, 1, 2]
    assert sum(r.n_samples for r in rows) == 23
    back = read_webdataset_shards(spark, d).collect()
    orig = {r.media_id: r for r in media.collect()}
    got = {r.media_id: r for r in back}
    assert set(got) == set(orig)
    for mid, r in got.items():
        o = orig[mid]
        assert bytes(r.content) == bytes(o.content)
        assert (r.kind, r.mime_type, r.width, r.height, r.duration_ms) == (
            o.kind, o.mime_type, o.width, o.height, o.duration_ms
        )


def test_deterministic_shard_bytes(spark, media, tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset_shards(media, d1, samples_per_shard=7)
    write_webdataset_shards(
        media.repartition(5), d2, samples_per_shard=7
    )  # partitioning must not matter
    for name in sorted(os.listdir(d1)):
        if not name.endswith(".tar"):
            continue
        with open(os.path.join(d1, name), "rb") as f1, open(
            os.path.join(d2, name), "rb"
        ) as f2:
            assert f1.read() == f2.read(), name


def test_webdataset_layout_convention(spark, media, tmp_path):
    """Each sample = blob + json sidecar sharing a basename; keys are the
    global hash-order rank; manifest.json mirrors the returned frame."""
    d = str(tmp_path / "wds")
    write_webdataset_shards(media, d, samples_per_shard=10)
    with tarfile.open(os.path.join(d, "shard-000000.tar")) as tar:
        names = tar.getnames()
    stems = sorted({n.rsplit(".", 1)[0] for n in names})
    assert stems == [f"{i:09d}" for i in range(10)]
    for s in stems:
        assert any(n == f"{s}.json" for n in names)
        assert any(n != f"{s}.json" and n.startswith(s + ".") for n in names)
    mf = json.load(open(os.path.join(d, "manifest.json")))
    assert [m["n_samples"] for m in mf] == [10, 10, 3]


def test_empty_and_null_blob(spark, tmp_path):
    rows = [(1, "image", None, "image/png", None, None, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    d = str(tmp_path / "wds")
    write_webdataset_shards(df, d, samples_per_shard=10)
    back = read_webdataset_shards(spark, d).collect()
    assert len(back) == 1 and bytes(back[0].content) == b""
    empty = spark.createDataFrame([], MEDIA_SCHEMA)
    d2 = str(tmp_path / "empty")
    m = write_webdataset_shards(empty, d2, samples_per_shard=10)
    assert m.count() == 0
    assert json.load(open(os.path.join(d2, "manifest.json"))) == []


def test_reader_is_one_task_per_shard(spark, media, tmp_path):
    d = str(tmp_path / "wds")
    write_webdataset_shards(media, d, samples_per_shard=10)
    df = read_webdataset_shards(spark, d)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: scan → parse, no shuffle
    assert df.filter(F.col("media_id").isNotNull()).count() == 23


def test_reader_degrades_on_malformed_shards(spark, media, tmp_path):
    """Corrupt-media-degrades-gracefully (ADVICE r4): a corrupt tar yields
    zero rows instead of killing the task, and an extensionless member is
    skipped while the rest of the shard still parses."""
    import io
    import tarfile

    d = str(tmp_path / "wds")
    write_webdataset_shards(media, d, samples_per_shard=10)
    n_good = read_webdataset_shards(spark, d).count()

    # a tar whose one valid sample sits next to an extensionless member
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name, data in [
            ("README", b"no extension"),
            ("sample-0.json", b'{"media_id": 900, "kind": "text"}'),
            ("sample-0.bin", b"payload"),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    with open(os.path.join(d, "shard-9998.tar"), "wb") as fh:
        fh.write(buf.getvalue())
    # and an outright corrupt shard
    with open(os.path.join(d, "shard-9999.tar"), "wb") as fh:
        fh.write(b"this is not a tar archive at all" * 40)

    back = read_webdataset_shards(spark, d)
    assert back.count() == n_good + 1  # corrupt shard → 0 rows, not a crash
    extra = back.filter(F.col("media_id") == 900).collect()
    assert len(extra) == 1 and bytes(extra[0].content) == b"payload"


def test_member_manifest_matches_shards(spark, media, tmp_path):
    """Member-level manifest agrees with the actual tar contents: two
    members per sample (blob then sidecar), rank-ordered names, sizes
    equal to the written byte counts."""
    from noaa_oracle_spark.pipeline.webdataset import (
        read_webdataset_member_manifest,
    )

    d = str(tmp_path / "wds")
    write_webdataset_shards(media, d, samples_per_shard=10)
    man = read_webdataset_member_manifest(spark, d).collect()
    back = read_webdataset_shards(spark, d)
    n_samples = back.count()
    assert len(man) == 2 * n_samples
    per_shard = {}
    for r in man:
        per_shard.setdefault(r.shard_id, []).append(r)
    for sid, rows in per_shard.items():
        rows.sort(key=lambda r: r.member_idx)
        assert [r.member_idx for r in rows] == list(range(len(rows)))
        # blob member first, then its .json sidecar, same 9-digit key
        for blob_row, meta_row in zip(rows[0::2], rows[1::2]):
            key = blob_row.member_name.rsplit(".", 1)[0]
            assert meta_row.member_name == key + ".json"
            assert len(key) == 9 and key.isdigit()
    # sizes: sum of blob members == sum of written blob bytes
    import pyspark.sql.functions as Fn
    total_blob = sum(
        r.size_bytes for r in man if not r.member_name.endswith(".json")
    )
    expect = (
        media.select(Fn.sum(Fn.octet_length("content"))).collect()[0][0] or 0
    )
    assert total_blob == expect


def test_member_manifest_skips_non_numeric_shard_infix(spark, media, tmp_path):
    """Round-6 ADVICE (low): a glob-matching file whose shard infix is
    not numeric (a partial writer's shard-tmp.tar) must be skipped like
    a corrupt tar, not fail the task."""
    import shutil

    from noaa_oracle_spark.pipeline.webdataset import (
        read_webdataset_member_manifest,
    )

    d = str(tmp_path / "wds")
    write_webdataset_shards(media, d, samples_per_shard=10)
    before = sorted(
        map(tuple, read_webdataset_member_manifest(spark, d).collect())
    )
    src = os.path.join(d, sorted(os.listdir(d))[0])
    shutil.copy(src, os.path.join(d, "shard-tmp.tar"))
    after = sorted(
        map(tuple, read_webdataset_member_manifest(spark, d).collect())
    )
    assert after == before


def test_reader_salvages_truncated_shard(spark, media, tmp_path):
    """A TRUNCATED tar opens fine and only fails during member iteration
    (r5 advice — tarfile.ReadError inside getmembers/extractfile, not
    open); the reader must keep the samples read before the truncation
    point instead of dying."""
    import io
    import tarfile

    d = str(tmp_path / "wds")
    os.makedirs(d)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for i in range(3):
            for name, data in [
                (f"sample-{i}.json", b'{"media_id": %d, "kind": "text"}' % (800 + i)),
                (f"sample-{i}.bin", b"x" * 600),
            ]:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
    whole = buf.getvalue()
    # cut mid-archive: sample-0 complete, later members lost/truncated
    with open(os.path.join(d, "shard-0000.tar"), "wb") as fh:
        fh.write(whole[: len(whole) // 2])

    back = read_webdataset_shards(spark, d).collect()
    by_id = {r.media_id: r for r in back}
    # sample-0 is entirely before the cut and must be salvaged intact;
    # later samples may be absent or partial (meta without blob) but the
    # task must not die.
    assert 800 in by_id, "truncated shard yielded nothing — prefix not salvaged"
    assert bytes(by_id[800].content) == b"x" * 600
    assert 802 not in by_id or by_id[802].content is None


def test_reader_truncation_between_blob_and_sidecar(spark, tmp_path):
    """The WRITER's member order is blob-then-sidecar, so a cut landing
    between a sample's .bin and its .json leaves a blob with no meta —
    such a sample has no media_id/kind to honor MEDIA_SCHEMA's non-null
    columns and must be SKIPPED (the salvaged prefix is the complete
    samples), never emitted with NULL media_id."""
    import io
    import tarfile

    d = str(tmp_path / "wds")
    os.makedirs(d)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        members = [
            ("sample-0.bin", b"a" * 600),
            ("sample-0.json", b'{"media_id": 700, "kind": "text"}'),
            ("sample-1.bin", b"b" * 600),
            ("sample-1.json", b'{"media_id": 701, "kind": "text"}'),
        ]
        offsets = []
        for name, data in members:
            offsets.append(buf.tell())
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    whole = buf.getvalue()
    # cut right after sample-1.bin's data, before sample-1.json's header
    cut = offsets[3]
    with open(os.path.join(d, "shard-0000.tar"), "wb") as fh:
        fh.write(whole[:cut])
    back = read_webdataset_shards(spark, d).collect()
    assert [r.media_id for r in back] == [700]  # sample-1 skipped whole
    assert all(r.media_id is not None and r.kind is not None for r in back)


def test_reader_skips_sample_with_corrupt_sidecar(spark, tmp_path):
    """A bit-flipped .json sidecar is a per-sample defect: the sample is
    dropped, the rest of the shard parses, the task survives (previously
    json.JSONDecodeError escaped the TarError-only except and killed the
    whole task)."""
    import io
    import tarfile

    d = str(tmp_path / "wds")
    os.makedirs(d)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name, data in [
            ("sample-0.bin", b"good"),
            ("sample-0.json", b'{"media_id": 710, "kind": "text"}'),
            ("sample-1.bin", b"bad-meta"),
            ("sample-1.json", b'{"media_id": 711, "ki\xff\xfe GARBAGE'),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    with open(os.path.join(d, "shard-0000.tar"), "wb") as fh:
        fh.write(buf.getvalue())
    back = read_webdataset_shards(spark, d).collect()
    assert [r.media_id for r in back] == [710]
    assert bytes(back[0].content) == b"good"


def test_streaming_member_manifest_incremental(spark, media, tmp_path):
    """The streaming manifest twin: shards arriving across micro-batches
    manifest incrementally (file-source ledger = the state), and the
    union of batches equals the batch reader's output."""
    from noaa_oracle_spark.pipeline.webdataset import (
        read_webdataset_member_manifest,
        stream_webdataset_member_manifest,
    )

    d = str(tmp_path / "wds")
    write_webdataset_shards(media, d, samples_per_shard=10)

    out = str(tmp_path / "manifest_out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            stream_webdataset_member_manifest(spark, d)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = spark.read.parquet(out).count()
    batch = read_webdataset_member_manifest(spark, d).count()
    assert first == batch > 0

    # a new shard lands; the next availableNow run manifests ONLY it
    extra = media.limit(3)
    write_webdataset_shards(extra, str(tmp_path / "staging"), 10)
    import shutil

    shutil.copy(
        os.path.join(str(tmp_path / "staging"), "shard-000000.tar"),
        os.path.join(d, "shard-000099.tar"),
    )
    drain()
    rows = spark.read.parquet(out)
    assert rows.count() == first + 6  # 3 samples × (blob + sidecar)
    assert rows.filter("shard_id = 99").count() == 6
