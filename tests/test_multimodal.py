"""Multimodal column plumbing: binary media columns + Arrow-batched
feature extraction (stubbed codecs, real Spark plumbing)."""

from __future__ import annotations

import hashlib

import pytest

from noaa_oracle_spark.pipeline.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    media_metadata,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes 1", "image/png", 64, 64, None),
        (2, "image", b"\x89PNG fake bytes 2", "image/png", 32, 32, None),
        (3, "audio", b"RIFF fake wav", "audio/wav", None, None, 2_000),
        (4, "video", b"\x00\x00ftyp fake mp4", "video/mp4", 640, 360, 3_500),
        (5, "image", None, "image/png", None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_blob_free(media):
    meta = media_metadata(media).collect()
    by_id = {r["media_id"]: r for r in meta}
    assert by_id[1]["n_bytes"] == 17
    assert by_id[1]["content_sha256"] == hashlib.sha256(
        b"\x89PNG fake bytes 1"
    ).hexdigest()
    assert by_id[5]["n_bytes"] is None  # NULL blob stays NULL


def test_image_feature_extraction(media):
    feats = extract_image_features(media, dim=8).collect()
    assert {r["media_id"] for r in feats} == {1, 2, 5}  # images only
    f1 = next(r for r in feats if r["media_id"] == 1)
    assert len(f1["feature"]) == 8
    # deterministic fake decode: same content → same features
    again = extract_image_features(media, dim=8).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_real_codec_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="pillow"):
        extract_image_features(media, codec="pillow")


def test_video_frame_sampling(media):
    frames = sample_video_frames(media, every_ms=1000).collect()
    # 3500 ms duration sampled at 1000 ms → frames at 0,1000,2000,3000
    assert [r["frame_ms"] for r in sorted(frames, key=lambda r: r["frame_ms"])] == [
        0, 1000, 2000, 3000,
    ]
    assert all(len(r["frame_hash"]) == 64 for r in frames)


def test_resize_plumbing(media):
    """Resize: image rows only, deterministic fake bytes, target dims as
    metadata — and re-running yields identical blobs (executor-stable)."""
    out = resize_images(media, 32, 32).collect()
    assert {r.media_id for r in out} == {1, 2, 5}
    assert all(r.width == 32 and r.height == 32 for r in out)
    assert all(isinstance(r.content, (bytes, bytearray)) for r in out)
    again = {r.media_id: bytes(r.content) for r in resize_images(media, 32, 32).collect()}
    assert {r.media_id: bytes(r.content) for r in out} == again
    # different target -> different bytes (the fake codec is target-aware)
    other = {r.media_id: bytes(r.content) for r in resize_images(media, 16, 16).collect()}
    assert all(other[m] != b for m, b in again.items())


def test_resize_real_codec_stubbed(media):
    with pytest.raises(NotImplementedError):
        resize_images(media, 32, 32, codec="pillow")


def test_audio_chunking(media):
    from noaa_oracle_spark.pipeline.multimodal import chunk_audio

    chunks = chunk_audio(media, window_ms=5_000).collect()
    assert chunks, "fixture has audio rows"
    by_media = {}
    for r in chunks:
        by_media.setdefault(r.media_id, []).append(r)
    for rows in by_media.values():
        rows.sort(key=lambda r: r.chunk_idx)
        # contiguous, non-overlapping windows covering [0, duration)
        assert rows[0].start_ms == 0
        for a, b in zip(rows, rows[1:]):
            assert a.end_ms == b.start_ms
        assert all(0.0 <= r.energy <= 1.0 for r in rows)
    # deterministic across partitionings
    again = chunk_audio(media.repartition(7), window_ms=5_000).collect()
    key = lambda r: (r.media_id, r.chunk_idx)
    assert sorted(map(tuple, again), key=lambda t: t[:2]) == sorted(
        map(tuple, chunks), key=lambda t: t[:2]
    )


def test_audio_real_codec_stubbed(media):
    from noaa_oracle_spark.pipeline.multimodal import chunk_audio

    with pytest.raises(NotImplementedError):
        chunk_audio(media, codec="pcm")
