"""Perceptual image hashing + Hamming-banded near-dup (the multimodal
sibling of the text SimHash/LSH tier), over the REAL raster codecs."""

from __future__ import annotations

import numpy as np
import pytest

from noaa_oracle_spark.pipeline.jpeg_codec import encode_jpeg
from noaa_oracle_spark.pipeline.media_codecs import (
    encode_png,
    phash,
)
from noaa_oracle_spark.pipeline.multimodal import (
    MEDIA_SCHEMA,
    image_phash,
    phash_near_dupes,
)


def _image(seed: int, h: int = 48, w: int = 48) -> np.ndarray:
    """Smooth random raster: low-frequency content so lossy JPEG keeps
    the perceptual structure (pHash's whole premise)."""
    rng = np.random.RandomState(seed)
    coarse = rng.randint(0, 256, (6, 6, 3)).astype(np.float64)
    up = np.repeat(np.repeat(coarse, h // 6 + 1, 0), w // 6 + 1, 1)[:h, :w]
    return up.astype(np.uint8)


def _hamming(a: int, b: int) -> int:
    # hashes are signed two's-complement 64-bit (Spark LongType domain)
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_deterministic_and_format_robust():
    img = _image(1)
    h_png = phash(img)
    assert phash(img) == h_png  # deterministic
    # the same pixels through a lossy re-encode: few bits move
    from noaa_oracle_spark.pipeline.jpeg_codec import decode_jpeg

    jpg = decode_jpeg(encode_jpeg(img, quality=85))
    assert _hamming(h_png, phash(jpg)) <= 6


def test_phash_separates_distinct_images():
    dists = [
        _hamming(phash(_image(i)), phash(_image(j)))
        for i in range(6)
        for j in range(i + 1, 6)
    ]
    assert min(dists) > 10  # distinct content is far in hash space


def test_image_phash_nulls_for_corrupt(spark):
    img = _image(2)
    rows = [
        (1, "image", encode_png(img), "image/png", 48, 48, None),
        (2, "image", b"not an image", "image/png", None, None, None),
        (3, "audio", b"RIFF", "audio/wav", None, None, 100),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r.phash for r in image_phash(media).collect()}
    assert set(got) == {1, 2}  # audio filtered, corrupt kept as NULL
    assert got[1] == phash(img) and got[2] is None


def test_phash_near_dupes_finds_planted_pair_only(spark):
    img = _image(3)
    rows = [
        (1, "image", encode_png(img), "image/png", 48, 48, None),
        (2, "image", encode_jpeg(img, quality=85), "image/jpeg", 48, 48, None),
    ] + [
        (10 + i, "image", encode_png(_image(50 + i)), "image/png", 48, 48, None)
        for i in range(5)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = [
        (r.id_a, r.id_b, r.hamming)
        for r in phash_near_dupes(media, max_distance=6).collect()
    ]
    assert [(p[0], p[1]) for p in pairs] == [(1, 2)]
    assert pairs[0][2] <= 6


def test_phash_near_dupes_parameter_guards(spark):
    media = spark.createDataFrame([], MEDIA_SCHEMA)
    with pytest.raises(ValueError):
        phash_near_dupes(media, max_distance=8, bands=8)  # voids recall
    with pytest.raises(ValueError):
        phash_near_dupes(media, bands=7)  # 7 does not divide 64


def test_phash_near_dupes_rejects_single_band(spark):
    media = spark.createDataFrame([], MEDIA_SCHEMA)
    with pytest.raises(ValueError):
        phash_near_dupes(media, max_distance=0, bands=1)
