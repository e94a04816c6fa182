"""WebDataset-style tar sharding for multimodal training corpora.

The de-facto interchange format for image/audio training data is sharded
POSIX tar archives ("WebDataset"): each sample is a group of files sharing
a basename — `000017.jpg` + `000017.json` — and a shard is a few hundred
MB of consecutive samples, streamed sequentially by data loaders. This
module writes and reads that layout with ONLY stdlib `tarfile`, mapping it
onto the engine's media tables:

  - `write_webdataset_shards(media, path, samples_per_shard)` — each
    sample emits `{key}.{ext}` (the blob, extension from the MIME type)
    and `{key}.json` (the metadata sidecar). Samples are hash-ordered by
    media_id (the deterministic shuffle every epoch pipeline wants) and
    assigned to shards by contiguous ranges of that order, so shard
    contents are reproducible across runs and engines. One executor task
    writes one shard — a sequential local tar build, the exact shape a
    1000-executor job needs (no shuffle of blob bytes beyond the one
    repartition that routes samples to their shard writer).
  - `read_webdataset_shards(spark, path)` — shards load via Spark's
    `binaryFile` source (one task per shard, no driver I/O) and a
    mapInPandas kernel re-groups member files by basename back into
    MEDIA_SCHEMA-shaped rows.

At 100 TB the rules match the other multimodal operators: blob bytes
never cross a shuffle as a join/agg payload — the single routing
repartition moves each blob exactly once, shard writers and readers are
map-side, and metadata-only consumers read the sidecar column without
touching blobs. Round-trip fidelity (bytes, mime, geometry) is pinned in
tests/test_webdataset.py.

Reference scope note: the reference engine has no multimodal tier; this
is part of the training-data-pipeline surface the build brief adds.
"""

from __future__ import annotations

import io
import json
import os
import posixpath
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from noaa_oracle_spark.pipeline.multimodal import MEDIA_SCHEMA

_EXT_BY_MIME = {
    "image/jpeg": "jpg",
    "image/png": "png",
    "image/bmp": "bmp",
    "image/x-portable-pixmap": "ppm",
    "audio/wav": "wav",
    "audio/x-wav": "wav",
    "video/x-ppm-stream": "ppmv",
}
_MIME_BY_EXT = {v: k for k, v in _EXT_BY_MIME.items()}
_MIME_BY_EXT["wav"] = "audio/wav"

SHARD_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("shard_path", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def _ext_for(mime: str | None, kind: str) -> str:
    if mime in _EXT_BY_MIME:
        return _EXT_BY_MIME[mime]
    return {"image": "img", "audio": "aud", "video": "vid"}.get(kind, "bin")


def write_webdataset_shards(
    media: DataFrame,
    path: str,
    samples_per_shard: int = 1000,
    salt: str = "",
) -> DataFrame:
    """Write `media` (MEDIA_SCHEMA) as `shard-%06d.tar` files under
    `path`; returns the shard manifest (shard_id, shard_path, n_samples,
    n_bytes), also persisted as `manifest.json`.

    Sample order inside and across shards is the md5(salt|media_id) hash
    order — the same deterministic epoch shuffle the packing operators
    use — and the shard id is the sample's rank range, so output bytes
    are reproducible run to run. Keys are the zero-padded rank, the
    WebDataset convention."""
    os.makedirs(path, exist_ok=True)
    n = media.count()
    if n == 0:
        manifest: list = []
        with open(os.path.join(path, "manifest.json"), "w") as fh:
            json.dump(manifest, fh)
        return media.sparkSession.createDataFrame([], SHARD_MANIFEST_SCHEMA)

    # global rank by hash order via the two-pass discipline: bucket by
    # hash prefix, rank within bucket, offset by bucket counts (no
    # single-partition window)
    h = F.md5(F.concat(F.lit(f"{salt}|"), F.col("media_id").cast("string")))
    b = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    base = media.withColumn("_h", h).withColumn("_b", b)
    from pyspark.sql.window import Window

    w = Window.partitionBy("_b").orderBy("_h", "media_id")
    local = base.withColumn("_rn", F.row_number().over(w))
    totals = local.groupBy("_b").agg(F.max("_rn").alias("_c")).collect()
    offsets, running = [], 0
    for row in sorted(totals, key=lambda r: r["_b"]):
        offsets.append((row["_b"], running))
        running += row["_c"]
    off_df = media.sparkSession.createDataFrame(offsets, "_b int, _off long")
    ranked = local.join(F.broadcast(off_df), "_b").withColumn(
        "_rank", (F.col("_off") + F.col("_rn") - 1).cast("long")
    )
    shard_of = (F.col("_rank") / samples_per_shard).cast("long")
    routed = ranked.withColumn("_shard", shard_of)

    n_shards = -(-n // samples_per_shard)
    out_schema = SHARD_MANIFEST_SCHEMA
    dest = path

    def write_shard(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=["shard_id", "shard_path", "n_samples", "n_bytes"]
            )
        sid = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("_rank")
        shard_path = os.path.join(dest, f"shard-{sid:06d}.tar")
        tmp = shard_path + ".tmp"
        with tarfile.open(tmp, "w") as tar:
            for _, row in pdf.iterrows():
                key = f"{int(row['_rank']):09d}"
                blob = bytes(row["content"]) if row["content"] is not None else b""
                ext = _ext_for(row["mime_type"], row["kind"])
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(blob)
                info.mtime = 0  # reproducible bytes
                tar.addfile(info, io.BytesIO(blob))
                meta = {
                    "media_id": int(row["media_id"]),
                    "kind": row["kind"],
                    "mime_type": row["mime_type"],
                    "width": None if pd.isna(row["width"]) else int(row["width"]),
                    "height": None if pd.isna(row["height"]) else int(row["height"]),
                    "duration_ms": None
                    if pd.isna(row["duration_ms"])
                    else int(row["duration_ms"]),
                }
                mb = json.dumps(meta, sort_keys=True).encode()
                minfo = tarfile.TarInfo(f"{key}.json")
                minfo.size = len(mb)
                minfo.mtime = 0
                tar.addfile(minfo, io.BytesIO(mb))
        os.replace(tmp, shard_path)
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "shard_path": [shard_path],
                "n_samples": [len(pdf)],
                "n_bytes": [os.path.getsize(shard_path)],
            }
        )

    manifest_df = (
        routed.repartition(max(n_shards, 1), "_shard")
        .groupBy("_shard")
        .applyInPandas(write_shard, out_schema)
    )
    rows = sorted(
        manifest_df.collect(), key=lambda r: r["shard_id"]
    )  # small-by-construction: one row per shard
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump([r.asDict() for r in rows], fh, indent=1)
    return media.sparkSession.createDataFrame(rows, SHARD_MANIFEST_SCHEMA)


MEMBER_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("member_idx", T.LongType(), False),
        T.StructField("member_name", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), False),
    ]
)


def _parse_member_manifest(
    batches: "Iterator[pd.DataFrame]",
) -> "Iterator[pd.DataFrame]":
    """mapInPandas kernel shared by the batch and streaming manifest
    readers: tar header walk, member data never materialized, corrupt or
    truncated shards degrade to the member prefix read so far."""
    for pdf in batches:
        out = {
            "shard_id": [],
            "member_idx": [],
            "member_name": [],
            "size_bytes": [],
        }
        for _, row in pdf.iterrows():
            name = posixpath.basename(row["path"])
            try:
                sid = int(name[len("shard-") : -len(".tar")])
            except ValueError:
                continue  # non-numeric infix (e.g. a partial writer's
                # shard-tmp.tar): skip the file, like corrupt tars
            try:
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(row["content"]))
                ) as tar:
                    for idx, member in enumerate(tar):
                        out["shard_id"].append(sid)
                        out["member_idx"].append(idx)
                        out["member_name"].append(member.name)
                        out["size_bytes"].append(int(member.size))
            except tarfile.TarError:
                pass  # keep the member prefix read before the fault
        yield pd.DataFrame(out)


def read_webdataset_member_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Member-level shard manifest: one row per tar member with the
    shard id (from the file name), the member's position in the archive,
    its name, and its payload size — the integrity surface a data-loader
    fleet checks before streaming (ordered keys, sizes, sample counts
    derive from it by aggregation).

    Same execution shape as `read_webdataset_shards`: one task per shard
    via binaryFile, header walk map-side, no shuffle. Member DATA is
    never materialized — only headers are read. Corrupt or truncated
    shards degrade to the member prefix read so far, matching the sample
    reader's convention."""
    shards = spark.read.format("binaryFile").load(
        posixpath.join(path, "shard-*.tar")
    )
    return shards.select("path", "content").mapInPandas(
        _parse_member_manifest, MEMBER_MANIFEST_SCHEMA
    )


def stream_webdataset_member_manifest(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming twin of `read_webdataset_member_manifest`: shards land
    continuously (an ingest fleet appending `shard-*.tar`) and each
    micro-batch manifests ONLY the newly arrived files — Structured
    Streaming's file-source ledger is the incremental state, the kernel
    is the identical map-side header walk.  Returns a streaming
    DataFrame; pair with `availableNow` triggers for catch-up runs and a
    `toTable`/parquet sink for a queryable manifest ledger."""
    from noaa_oracle_spark.pipeline.binary_stream import stream_binary_files

    return stream_binary_files(
        spark, path, "shard-*.tar", max_files_per_trigger
    ).mapInPandas(_parse_member_manifest, MEMBER_MANIFEST_SCHEMA)


def read_webdataset_shards(spark: SparkSession, path: str) -> DataFrame:
    """Load `shard-*.tar` files back into MEDIA_SCHEMA rows. One task per
    shard via the binaryFile source; the tar parse and sample re-grouping
    run map-side in a mapInPandas kernel (blob bytes move straight from
    the shard file into the output column — no shuffle)."""
    shards = spark.read.format("binaryFile").load(
        posixpath.join(path, "shard-*.tar")
    )

    def parse(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            for _, row in pdf.iterrows():
                samples: dict[str, dict] = {}
                # Corrupt shard degrades gracefully, same convention as
                # the media decoders (corrupt blob → NULL fields), instead
                # of killing the whole task.  The try must cover member
                # iteration too: a TRUNCATED tar opens fine and only
                # raises ReadError inside getmembers()/extractfile()
                # (r5 advice); members read before the truncation point
                # are kept.
                try:
                    with tarfile.open(
                        fileobj=io.BytesIO(bytes(row["content"]))
                    ) as tar:
                        for member in tar:
                            if not member.isfile():
                                continue
                            key, sep, ext = member.name.rpartition(".")
                            if not sep:
                                continue  # extensionless member: not ours
                            data = tar.extractfile(member).read()
                            entry = samples.setdefault(key, {})
                            if ext == "json":
                                # a bit-flipped sidecar is a per-sample
                                # defect, not a task failure: drop the
                                # meta, let the sample fall to the
                                # incomplete-sample rule below
                                try:
                                    entry["meta"] = json.loads(data)
                                except (
                                    json.JSONDecodeError,
                                    UnicodeDecodeError,
                                ):
                                    pass
                            else:
                                entry["blob"] = data
                                entry["ext"] = ext
                except tarfile.TarError:
                    pass  # header-corrupt → zero rows; truncated → prefix
                out = {
                    "media_id": [],
                    "kind": [],
                    "content": [],
                    "mime_type": [],
                    "width": [],
                    "height": [],
                    "duration_ms": [],
                }
                for key in sorted(samples):
                    s = samples[key]
                    # incomplete-sample rule: the writer emits the blob
                    # BEFORE its .json sidecar, so a truncation (or a
                    # corrupt sidecar) can leave a blob with no meta —
                    # such a sample has no media_id/kind to honor
                    # MEDIA_SCHEMA's non-null columns and is not
                    # salvageable; skip it (the salvaged prefix is the
                    # COMPLETE samples)
                    if "meta" not in s:
                        continue
                    meta = s["meta"]
                    out["media_id"].append(meta.get("media_id"))
                    out["kind"].append(meta.get("kind"))
                    out["content"].append(s.get("blob"))
                    out["mime_type"].append(
                        meta.get("mime_type")
                        or _MIME_BY_EXT.get(s.get("ext", ""), None)
                    )
                    out["width"].append(meta.get("width"))
                    out["height"].append(meta.get("height"))
                    out["duration_ms"].append(meta.get("duration_ms"))
                yield pd.DataFrame(out)

    return shards.select("content").mapInPandas(parse, MEDIA_SCHEMA)
