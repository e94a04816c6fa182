"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque `binary` columns plus typed metadata
(the same pattern as Parquet BYTE_ARRAY blobs next to scalar columns). The
Spark-side plumbing — schemas, Arrow-batched mapInPandas operators, batch
shapes, partition sizing — is real and tested. Codecs come in two tiers:

  - codec="fake": the deterministic hash stand-in (plumbing tests).
  - codec="raster" (images) / codec="wav" (audio): REAL byte-level
    decoders built on stdlib+numpy alone (pipeline/media_codecs.py):
    P6 PPM, uncompressed BMP, PNG (zlib inflate + full unfiltering,
    8-bit gray/RGB/palette/alpha variants), and baseline JPEG (full
    T.81 sequential decode: Huffman MCU entropy decoding, restart
    markers, any sampling factors, IDCT, JFIF color convert) AND
    progressive JPEG (SOF2 spectral-selection + successive-approximation
    scans — pipeline/jpeg_codec.py) for images, RIFF/WAVE PCM for audio.
    Real pixels/samples in, real features/resizes/energies out; corrupt
    blobs degrade to NULL output columns instead of failing the task.
  - anything else (MP3/MP4…) still raises
    NotImplementedError — those genuinely need external libraries (or
    codecs out of scope for a data engine) this runtime doesn't ship.

At 100 TB the rules encoded here:
  - blobs never pass through a shuffle: metadata extraction and feature
    UDFs run map-side before any wide operator; joins/groupBys happen on
    the extracted (small) columns with the blob dropped or re-attached by a
    final broadcast-free key join.
  - mapInPandas streams Arrow batches, so one task never materializes its
    whole partition of blobs; batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_metadata(media: DataFrame) -> DataFrame:
    """Blob-free metadata projection — pure Column expressions, so Catalyst
    prunes the binary column out of the scan when only metadata is used."""
    return media.select(
        "media_id",
        "kind",
        "mime_type",
        F.length("content").cast("long").alias("n_bytes"),
        F.sha2("content", 256).alias("content_sha256"),
    )


def _fake_decode(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: hash-derived features.
    Stable across runs/executors — good enough to test plumbing and
    partitioning without a codec library."""
    h = hashlib.sha256(content or b"").digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def _require_codec(codec: str, supported: tuple[str, ...]) -> None:
    if codec not in supported:
        raise NotImplementedError(
            f"codec {codec!r}: needs an external media library not present "
            f"in this runtime (supported here: {', '.join(supported)})"
        )


def _raster_features(content: bytes | None, dim: int) -> list[float] | None:
    from noaa_oracle_spark.pipeline.media_codecs import (
        decode_image,
        grid_features,
    )

    try:
        return grid_features(decode_image(content or b""), dim)
    except ValueError:
        return None


def extract_image_features(
    media: DataFrame, dim: int = 8, codec: str = "fake"
) -> DataFrame:
    """Arrow-batched feature extraction over image blobs via mapInPandas.

    `codec="fake"` uses the deterministic stub; `codec="raster"` decodes
    real P6 PPM / BMP bytes and mean-pools pixels onto a grid
    (media_codecs.grid_features), yielding NULL features for undecodable
    blobs; other codec names raise NotImplementedError."""
    _require_codec(codec, ("fake", "raster"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_sha256": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "n_bytes": content.map(lambda b: len(b or b"")).astype("int64"),
                    "feature": content.map(
                        (lambda b: _raster_features(b, dim))
                        if codec == "raster"
                        else (lambda b: _fake_decode(b, dim))
                    ),
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "content"
    ).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def decode_images(media: DataFrame, codec: str = "raster") -> DataFrame:
    """The decode step proper: blob → measured geometry + channel means
    from the actual pixel data (P6 PPM / uncompressed BMP via
    media_codecs). Undecodable blobs keep their row with NULL fields —
    at corpus scale garbage rows are data, not errors."""
    _require_codec(codec, ("raster",))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from noaa_oracle_spark.pipeline.media_codecs import (
            decode_image,
            sniff_image_format,
        )

        for pdf in it:
            rows = {k: [] for k in
                    ("media_id", "format", "width", "height",
                     "mean_r", "mean_g", "mean_b")}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                rows["media_id"].append(mid)
                try:
                    img = decode_image(blob or b"")
                except ValueError:
                    rows["format"].append(None)
                    for k in ("width", "height", "mean_r", "mean_g", "mean_b"):
                        rows[k].append(None)
                    continue
                means = img.astype("float64").mean(axis=(0, 1))
                rows["format"].append(sniff_image_format(blob))
                rows["width"].append(img.shape[1])
                rows["height"].append(img.shape[0])
                rows["mean_r"].append(float(means[0]))
                rows["mean_g"].append(float(means[1]))
                rows["mean_b"].append(float(means[2]))
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "content"
    ).mapInPandas(batches, DECODED_IMAGE_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ms", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
    ]
)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, codec: str = "fake"
) -> DataFrame:
    """Frame-sampling: one output row per sampled timestamp.

    `codec="fake"` is the plumbing contract — pure expressions, a
    pseudo-frame hash per timestamp, columns (media_id, frame_ms,
    frame_hash).

    `codec="ppmstream"` is the REAL path for concatenated-P6 blobs (the
    exact stream `ffmpeg -f image2pipe -vcodec ppm` emits;
    media_codecs.decode_ppm_stream). Frames are assumed evenly spaced over
    `duration_ms` (PPM streams carry no timing); each sampled timestamp
    maps to its covering frame and the row carries the decoded frame's
    pixel sha256 and mean Rec.601 luma — proof the actual pixels were
    read. Columns follow VIDEO_FRAME_SCHEMA; undecodable blobs expand to
    zero rows. Blobs stay map-side (mapInPandas, Arrow-batched); only the
    small per-frame rows continue downstream — the same 100 TB rule as
    chunk_audio."""
    _require_codec(codec, ("fake", "ppmstream"))
    if codec == "ppmstream":
        vids = media.filter(F.col("kind") == "video").select(
            "media_id",
            "content",
            F.coalesce("duration_ms", F.lit(0)).alias("dur"),
        )

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from noaa_oracle_spark.pipeline.media_codecs import (
                decode_ppm_stream,
                mean_luma,
            )

            for pdf in it:
                out = {k: [] for k in (
                    "media_id", "frame_ms", "frame_index",
                    "frame_sha256", "mean_luma",
                )}
                for mid, blob, dur in zip(
                    pdf["media_id"], pdf["content"], pdf["dur"]
                ):
                    try:
                        frames = decode_ppm_stream(blob or b"")
                    except ValueError:
                        continue
                    n = len(frames)
                    # no timing in the container: spread frames evenly
                    # over the metadata duration (or 1 frame/s if absent)
                    total = int(dur) if dur else n * 1000
                    for t in range(0, max(total, 1), every_ms):
                        idx = min(n - 1, t * n // max(total, 1))
                        img = frames[idx]
                        out["media_id"].append(mid)
                        out["frame_ms"].append(t)
                        out["frame_index"].append(idx)
                        out["frame_sha256"].append(
                            hashlib.sha256(img.tobytes()).hexdigest()
                        )
                        out["mean_luma"].append(mean_luma(img))
                yield pd.DataFrame(out)

        return vids.mapInPandas(batches, VIDEO_FRAME_SCHEMA)
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        "content",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)
                ),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )
    return frames.select(
        "media_id",
        "frame_ms",
        F.sha2(
            F.concat(
                F.coalesce(F.col("content"), F.lit(b"")),
                F.col("frame_ms").cast("string").cast("binary"),
            ),
            256,
        ).alias("frame_hash"),
    )


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, codec: str = "fake"
) -> DataFrame:
    """Resize plumbing: binary-in → binary-out mapInPandas with the target
    dimensions as metadata. The fake codec emits a deterministic
    content+target-derived blob (so downstream dedup/feature stages have
    real bytes to chew on); a real codec drops in by replacing only the
    per-batch transform — the schema, batching, and blob-stays-map-side
    contract are what this module fixes. `codec="raster"` is that real
    transform for P6 PPM / BMP input: nearest-neighbor resample of the
    actual pixels, re-encoded as P6 PPM (NULL content when undecodable)."""
    _require_codec(codec, ("fake", "raster"))
    tag = f"{width}x{height}".encode()

    def _raster_resize(b: bytes | None) -> bytes | None:
        from noaa_oracle_spark.pipeline.media_codecs import (
            decode_image,
            encode_ppm,
            resize_nearest,
        )

        try:
            return encode_ppm(resize_nearest(decode_image(b or b""), width, height))
        except ValueError:
            return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"].map(
                        _raster_resize
                        if codec == "raster"
                        else (lambda b: hashlib.sha256((b or b"") + tag).digest())
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(batches, RESIZED_IMAGE_SCHEMA)
    )


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("start_ms", T.LongType(), False),
        T.StructField("end_ms", T.LongType(), False),
        T.StructField("energy", T.DoubleType(), True),
    ]
)


def text_to_wav_media(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate: int = 8000,
) -> DataFrame:
    """Deterministic text→PCM mux (the q128 fixture contract, shared by
    the gate and the bench so they always measure the same workload):
    sample_j = codepoint(char_j)·129 − 8000, mono 16-bit WAV at `rate`.
    Empty or NULL texts are dropped BEFORE muxing — a zero-sample clip
    has no feature row, matching the oracle's per-character expansion
    (which produces no rows for an empty string).  Map-side only."""

    def mux(batches):
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                # vectorized ord(): latin-1 bytes ARE the codepoints for
                # the ascii range — no per-char Python loop
                try:
                    raw = text.encode("latin-1")
                except UnicodeEncodeError:
                    continue  # degrade per row: a non-latin-1 document
                    # drops one clip, it must not kill the task
                i16 = (
                    np.frombuffer(raw, np.uint8).astype(np.int32) * 129
                    - 8000
                ).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(rate)
                    wf.writeframes(i16.tobytes())
                rows.append(
                    {"media_id": doc_id, "content": buf.getvalue()}
                )
            yield pd.DataFrame(rows)

    return (
        docs.select(id_col, text_col)
        .filter(F.length(F.col(text_col)) >= 1)
        .mapInPandas(mux, "media_id long, content binary")
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("peak_i16", T.LongType(), True),
    ]
)


def audio_features(media: DataFrame, codec: str = "wav") -> DataFrame:
    """Whole-clip audio descriptors from REAL PCM decode
    (media_codecs.decode_wav): sample count, header sample rate, and
    three INTEGER-domain features — energy as Σ s², zero crossings
    (strict sign flips), peak |s| — over the recovered 16-bit samples.

    The integer domain is deliberate: every feature is exact in any
    engine, so the full mux → RIFF parse → PCM decode → feature path is
    hash-gradeable end to end (q128), the same discipline as the MP4 and
    MP3 container gates; derived floats (RMS) belong downstream, rounded
    from these integers.  Undecodable blobs yield NULL feature columns
    with the row kept (the metadata pattern — a corrupt clip is a fact
    about the corpus, not a task failure).

    Scale shape: map-side Arrow-batched mapInPandas; blobs never cross a
    shuffle; output is a slim 6-column frame joins can key on."""
    _require_codec(codec, ("wav",))
    frames = media.select("media_id", "content")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from noaa_oracle_spark.pipeline.media_codecs import decode_wav

        for pdf in it:
            out = {k: [] for k in (
                "media_id", "n_samples", "sample_rate", "sum_sq",
                "zero_crossings", "peak_i16",
            )}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                out["media_id"].append(mid)
                try:
                    x, rate = decode_wav(bytes(blob or b""))
                except ValueError:
                    for k in ("n_samples", "sample_rate", "sum_sq",
                              "zero_crossings", "peak_i16"):
                        out[k].append(None)
                    continue
                # width-2 PCM decodes to i16/32768 exactly — the rint
                # recovers the original integer samples losslessly
                s = np.rint(x * 32768.0).astype(np.int64)
                out["n_samples"].append(len(s))
                out["sample_rate"].append(int(rate))
                out["sum_sq"].append(int((s * s).sum()) if len(s) else 0)
                out["zero_crossings"].append(
                    int(((s[1:] * s[:-1]) < 0).sum()) if len(s) > 1 else 0
                )
                out["peak_i16"].append(
                    int(np.abs(s).max()) if len(s) else 0
                )
            yield pd.DataFrame(out)

    return frames.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def chunk_audio(
    media: DataFrame, window_ms: int = 5_000, codec: str = "fake"
) -> DataFrame:
    """Audio windowing plumbing: one row per fixed `window_ms` chunk with a
    per-chunk energy score — the segmentation step ahead of any ASR /
    audio-embedding stage. PCM decode is stubbed like the image codec; the
    deterministic fake derives energy from the chunk's slice of the blob
    (stable across partitionings), while the Arrow-batched mapInPandas
    shape — blob stays map-side, chunks explode AFTER the per-row work —
    is the real scale contract.

    `codec="wav"` is the REAL path for RIFF/WAVE PCM blobs
    (media_codecs.decode_wav): duration is measured from the sample count
    and rate (the metadata column is ignored), and each window's energy is
    the true RMS of its samples. Undecodable blobs contribute zero chunk
    rows (the operator is an expansion; garbage expands to nothing)."""
    _require_codec(codec, ("fake", "wav"))
    audio = media.filter(F.col("kind") == "audio").select(
        "media_id", "content", F.coalesce("duration_ms", F.lit(0)).alias("dur")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from noaa_oracle_spark.pipeline.media_codecs import (
            decode_wav,
            rms_energy,
        )

        for pdf in it:
            out = {k: [] for k in
                   ("media_id", "chunk_idx", "start_ms", "end_ms", "energy")}

            def emit(mid, i, lo, hi, energy):
                out["media_id"].append(mid)
                out["chunk_idx"].append(i)
                out["start_ms"].append(lo)
                out["end_ms"].append(hi)
                out["energy"].append(energy)

            for mid, blob, dur in zip(
                pdf["media_id"], pdf["content"], pdf["dur"]
            ):
                blob = blob if blob is not None else b""
                if codec == "wav":
                    try:
                        samples, rate = decode_wav(blob)
                    except ValueError:
                        continue
                    total_ms = len(samples) * 1000 // rate
                    n = max(1, (total_ms + window_ms - 1) // window_ms)
                    for i in range(n):
                        lo = i * window_ms
                        hi = min(total_ms, lo + window_ms)
                        sl = samples[
                            lo * rate // 1000 : hi * rate // 1000
                        ]
                        emit(mid, i, lo, hi, rms_energy(sl))
                    continue
                n = max(1, (int(dur) + window_ms - 1) // window_ms)
                for i in range(n):
                    lo = i * window_ms
                    hi = min(int(dur), lo + window_ms)
                    sl = blob[
                        len(blob) * i // n : len(blob) * (i + 1) // n
                    ]
                    h = hashlib.sha256(sl).digest()
                    emit(mid, i, lo, hi, int.from_bytes(h[:4], "big") / 2**32)
            yield pd.DataFrame(out)

    return audio.mapInPandas(batches, AUDIO_CHUNK_SCHEMA)


IMAGE_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), True),
    ]
)


def image_phash(media: DataFrame) -> DataFrame:
    """64-bit DCT perceptual hash per image blob (media_codecs.phash) —
    map-side mapInPandas over the real raster codecs (PPM/BMP/PNG/JPEG);
    undecodable blobs get NULL, row kept (the media degrade convention).
    Blobs never cross an exchange; the 8-byte hash is what shuffles
    downstream."""
    from noaa_oracle_spark.pipeline.media_codecs import decode_image, phash

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(blob):
            try:
                return phash(decode_image(bytes(blob) if blob is not None else b""))
            except Exception:
                return None

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pdf["content"].map(one).astype("object"),
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "content"
    ).mapInPandas(kernel, IMAGE_PHASH_SCHEMA)


def phash_near_dupes(
    media: DataFrame,
    max_distance: int = 6,
    bands: int = 8,
) -> DataFrame:
    """Image near-duplicate pairs by pHash Hamming distance — the
    multimodal sibling of the text tier's SimHash/LSH dedup: the 64-bit
    hash splits into `bands` equal bit-bands, candidates are pairs
    agreeing on ANY band (an equi-join on (band_idx, band_value) — the
    shuffle key, exactly the MinHash-LSH shape), and candidates are
    verified exactly with bit_count(a XOR b) <= max_distance.

    Pigeonhole recall guarantee: two hashes within Hamming distance d
    differ in at most d bands, so with d < bands they MUST agree on at
    least one band — recall is exactly 1.0 for max_distance < bands
    (enforced); no all-pairs comparison ever happens.  At corpus scale
    a viral image (one hot (band, value) bucket) is the standard AQE
    skew-join case.

    Returns (id_a, id_b, hamming) with id_a < id_b."""
    if not 2 <= bands <= 64 or 64 % bands:
        # bands=1 would need a 64-bit all-ones mask literal, which
        # overflows LongType — and a single band is an exact-equality
        # join anyway, not a near-dup search
        raise ValueError(
            f"phash_near_dupes: bands must divide 64 and be in [2, 64], "
            f"got {bands}"
        )
    if max_distance >= bands:
        raise ValueError(
            f"phash_near_dupes: max_distance {max_distance} >= bands "
            f"{bands} voids the pigeonhole recall guarantee — raise "
            "bands or lower max_distance"
        )
    width = 64 // bands
    hashed = image_phash(media).filter(F.col("phash").isNotNull())
    bands_df = hashed.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(
                            F.col("phash"), i * width
                        ).bitwiseAND(F.lit((1 << width) - 1)).alias("band_val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band"),
    ).select("media_id", "phash", "band.band_idx", "band.band_val")
    a = bands_df.select(
        F.col("band_idx"),
        F.col("band_val"),
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("_pa"),
    )
    b = bands_df.select(
        F.col("band_idx"),
        F.col("band_val"),
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("_pb"),
    )
    hamming = F.bit_count(F.col("_pa").bitwiseXOR(F.col("_pb")))
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(hamming <= max_distance)
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
    )
