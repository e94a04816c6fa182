"""Real-bytes multimodal codecs: stdlib+numpy decoders (P6 PPM,
uncompressed BMP, RIFF/WAVE PCM) and the Spark operators running them over
actual encoded media — with numpy computing every expected value
independently of the code under test."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from noaa_oracle_spark.pipeline.media_codecs import (
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    grid_features,
    resize_nearest,
    rms_energy,
    sniff_image_format,
)
from noaa_oracle_spark.pipeline.multimodal import (
    MEDIA_SCHEMA,
    chunk_audio,
    decode_images,
    extract_image_features,
    resize_images,
)

RNG = np.random.default_rng(7)


def _bmp_bytes(img: np.ndarray, bpp: int = 24, top_down: bool = False) -> bytes:
    """Hand-rolled BMP encoder (the decoder under test must not write its
    own fixtures): BGR(A) channels, 4-byte row padding, bottom-up rows."""
    h, w = img.shape[:2]
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    rows = b""
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = b""
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            row += bytes([b, g, r]) + (b"\xff" if bpp == 32 else b"")
        rows += row + b"\x00" * (stride - len(row))
    height_field = -h if top_down else h
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, height_field, 1, bpp, 0, len(rows), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40)
    return header + info + rows


# ---------------------------------------------------------------------------
# codec unit tests (pure bytes <-> numpy)
# ---------------------------------------------------------------------------


def test_ppm_round_trip_with_comment():
    img = RNG.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    data = encode_ppm(img)
    assert sniff_image_format(data) == "ppm"
    np.testing.assert_array_equal(decode_ppm(data), img)
    # header comments are legal PPM and must be skipped
    commented = data.replace(b"P6\n", b"P6\n# a comment\n", 1)
    np.testing.assert_array_equal(decode_ppm(commented), img)


@pytest.mark.parametrize("bpp,top_down", [(24, False), (24, True), (32, False)])
def test_bmp_decode_geometry_and_channels(bpp, top_down):
    # width 3 forces row padding at 24 bpp (9 bytes -> stride 12)
    img = RNG.integers(0, 256, (4, 3, 3), dtype=np.uint8)
    got = decode_bmp(_bmp_bytes(img, bpp=bpp, top_down=top_down))
    np.testing.assert_array_equal(got, img)


def test_decode_rejects_garbage():
    for blob in (b"", b"JFIF not supported", b"BM\x00\x01", b"P6 broken"):
        with pytest.raises(ValueError):
            decode_image(blob)


def test_resize_nearest_semantics():
    # 2x2 checker upsampled 2x: each source pixel becomes a 2x2 block
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = img[1, 1] = 255
    up = resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    np.testing.assert_array_equal(up[:2, :2], 255)
    np.testing.assert_array_equal(up[:2, 2:], 0)
    np.testing.assert_array_equal(up[2:, 2:], 255)
    # downsample back recovers the original
    np.testing.assert_array_equal(resize_nearest(up, 2, 2), img)


def test_grid_features_uniform_image():
    img = np.full((10, 12, 3), 128, np.uint8)
    feats = grid_features(img, 8)
    assert len(feats) == 8
    assert all(abs(f - 128 / 255) < 1e-9 for f in feats)


def test_wav_round_trip_and_rms():
    t = np.arange(8000) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, rate = decode_wav(encode_wav(sig, 8000))
    assert rate == 8000 and len(samples) == 8000
    # 16-bit quantization bounds the round-trip error
    assert np.max(np.abs(samples - sig)) < 1e-3
    # RMS of a full-period sine is amplitude/sqrt(2)
    assert abs(rms_energy(samples) - 0.5 / np.sqrt(2)) < 1e-3


def test_wav_stereo_downmix_and_8bit():
    import io
    import wave

    # stereo 16-bit: L = 0.5, R = -0.5 -> mono mix 0.0
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(4000)
        frames = np.empty(200, "<i2")
        frames[0::2] = 16384
        frames[1::2] = -16384
        wf.writeframes(frames.tobytes())
    samples, rate = decode_wav(buf.getvalue())
    assert rate == 4000 and len(samples) == 100
    assert np.max(np.abs(samples)) < 1e-9

    # 8-bit unsigned: constant 128 -> silence
    buf8 = io.BytesIO()
    with wave.open(buf8, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(4000)
        wf.writeframes(bytes([128] * 50))
    s8, _ = decode_wav(buf8.getvalue())
    assert np.max(np.abs(s8)) < 1e-9


# ---------------------------------------------------------------------------
# Spark operators over real encoded media
# ---------------------------------------------------------------------------

IMG_A = RNG.integers(0, 256, (6, 4, 3), dtype=np.uint8)
IMG_B = RNG.integers(0, 256, (3, 5, 3), dtype=np.uint8)
WAV_SIG = 0.25 * np.sin(2 * np.pi * 220 * np.arange(12000) / 8000.0)


@pytest.fixture(scope="module")
def real_media(spark):
    rows = [
        (1, "image", bytes(encode_ppm(IMG_A)), "image/x-ppm", 4, 6, None),
        (2, "image", bytes(_bmp_bytes(IMG_B)), "image/bmp", 5, 3, None),
        (3, "image", b"JFIF garbage", "image/jpeg", None, None, None),
        (4, "audio", bytes(encode_wav(WAV_SIG, 8000)), "audio/wav", None, None, None),
        (5, "audio", b"not audio at all", "audio/wav", None, None, 9_000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_images_measures_real_pixels(real_media):
    by_id = {r["media_id"]: r for r in decode_images(real_media).collect()}
    assert set(by_id) == {1, 2, 3}
    a = by_id[1]
    assert (a["format"], a["width"], a["height"]) == ("ppm", 4, 6)
    assert abs(a["mean_r"] - IMG_A[:, :, 0].mean()) < 1e-9
    assert abs(a["mean_b"] - IMG_A[:, :, 2].mean()) < 1e-9
    b = by_id[2]
    assert (b["format"], b["width"], b["height"]) == ("bmp", 5, 3)
    assert abs(b["mean_g"] - IMG_B[:, :, 1].mean()) < 1e-9
    g = by_id[3]  # garbage keeps its row, NULL fields
    assert g["format"] is None and g["width"] is None and g["mean_r"] is None


def test_extract_features_raster_matches_oracle(real_media):
    rows = extract_image_features(real_media, dim=12, codec="raster").collect()
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[1]["feature"] == pytest.approx(grid_features(IMG_A, 12))
    assert by_id[2]["feature"] == pytest.approx(grid_features(IMG_B, 12))
    assert by_id[3]["feature"] is None


def test_resize_images_raster_real_pixels(real_media):
    rows = resize_images(real_media, 8, 8, codec="raster").collect()
    by_id = {r["media_id"]: r for r in rows}
    got = decode_ppm(bytes(by_id[1]["content"]))
    np.testing.assert_array_equal(got, resize_nearest(IMG_A, 8, 8))
    assert by_id[3]["content"] is None
    assert by_id[1]["width"] == by_id[1]["height"] == 8


def test_chunk_audio_wav_real_rms(real_media):
    rows = chunk_audio(real_media, window_ms=500, codec="wav").collect()
    # 12000 samples @ 8 kHz = 1500 ms -> 3 windows; garbage blob: no rows
    assert {r["media_id"] for r in rows} == {4}
    chunks = sorted(rows, key=lambda r: r["chunk_idx"])
    assert [(c["start_ms"], c["end_ms"]) for c in chunks] == [
        (0, 500), (500, 1000), (1000, 1500),
    ]
    for c in chunks:
        lo = c["start_ms"] * 8
        hi = c["end_ms"] * 8
        # 16-bit quantization error only
        assert c["energy"] == pytest.approx(rms_energy(WAV_SIG[lo:hi]), abs=1e-3)


def test_unsupported_codecs_still_gate(real_media):
    with pytest.raises(NotImplementedError):
        extract_image_features(real_media, codec="jpeg")
    with pytest.raises(NotImplementedError):
        decode_images(real_media, codec="jpeg")
    with pytest.raises(NotImplementedError):
        resize_images(real_media, 4, 4, codec="jpeg")
    with pytest.raises(NotImplementedError):
        chunk_audio(real_media, codec="mp3")


class TestPpmStream:
    def test_roundtrip_mixed_geometry(self):
        import numpy as np

        from noaa_oracle_spark.pipeline.media_codecs import (
            decode_ppm_stream,
            encode_ppm_stream,
        )

        frames = [
            np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3),
            np.full((2, 3, 3), 7, np.uint8),
        ]
        out = decode_ppm_stream(encode_ppm_stream(frames))
        assert len(out) == 2
        assert all((a == b).all() for a, b in zip(frames, out))

    def test_truncated_trailing_frame_raises(self):
        import numpy as np
        import pytest

        from noaa_oracle_spark.pipeline.media_codecs import (
            decode_ppm_stream,
            encode_ppm_stream,
        )

        blob = encode_ppm_stream([np.zeros((2, 2, 3), np.uint8)] * 2)
        with pytest.raises(ValueError, match="truncated"):
            decode_ppm_stream(blob[:-1])

    def test_empty_and_garbage_raise(self):
        import pytest

        from noaa_oracle_spark.pipeline.media_codecs import decode_ppm_stream

        with pytest.raises(ValueError):
            decode_ppm_stream(b"")
        with pytest.raises(ValueError):
            decode_ppm_stream(b"JUNKJUNK")


# ---------------------------------------------------------------------------
# PNG (stdlib zlib decode)
# ---------------------------------------------------------------------------


def _png_bytes_independent(img: np.ndarray) -> bytes:
    """Test-local PNG writer (filter 0, truecolor) — written against the
    PNG spec directly so the decoder under test is checked against an
    INDEPENDENT encoding, not its own sibling."""
    import zlib

    h, w = img.shape[:2]
    raw = b"".join(
        b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_raw(w, h, color, rows: bytes, extra_chunks=()) -> bytes:
    import zlib

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    )
    for ctype, payload in extra_chunks:
        out += chunk(ctype, payload)
    return out + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b"")


class TestPng:
    def test_independent_filter0_fixture(self):
        from noaa_oracle_spark.pipeline.media_codecs import decode_png

        img = RNG.integers(0, 256, (7, 5, 3), dtype=np.uint8)
        data = _png_bytes_independent(img)
        assert sniff_image_format(data) == "png"
        np.testing.assert_array_equal(decode_png(data), img)
        np.testing.assert_array_equal(decode_image(data), img)

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_all_filter_types_round_trip(self, ftype):
        from noaa_oracle_spark.pipeline.media_codecs import (
            decode_png,
            encode_png,
        )

        img = RNG.integers(0, 256, (9, 6, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_png(encode_png(img, filter_type=ftype)), img
        )

    def test_gray_alpha_palette_variants(self):
        from noaa_oracle_spark.pipeline.media_codecs import decode_png

        # gray (color 0): value expands to all three channels
        gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
        rows = b"".join(b"\x00" + gray[y].tobytes() for y in range(3))
        out = decode_png(_png_raw(4, 3, 0, rows))
        np.testing.assert_array_equal(out, np.repeat(gray[..., None], 3, 2))

        # gray+alpha (color 4): alpha dropped
        ga = np.dstack([gray, np.full((3, 4), 7, np.uint8)])
        rows = b"".join(b"\x00" + ga[y].tobytes() for y in range(3))
        out = decode_png(_png_raw(4, 3, 4, rows))
        np.testing.assert_array_equal(out, np.repeat(gray[..., None], 3, 2))

        # RGBA (color 6): alpha dropped
        rgb = RNG.integers(0, 256, (3, 4, 3), dtype=np.uint8)
        rgba = np.dstack([rgb, np.full((3, 4), 9, np.uint8)])
        rows = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
        np.testing.assert_array_equal(decode_png(_png_raw(4, 3, 6, rows)), rgb)

        # palette (color 3): indices map through PLTE
        pal = RNG.integers(0, 256, (4, 3), dtype=np.uint8)
        idx = np.array([[0, 1], [2, 3]], np.uint8)
        rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
        out = decode_png(
            _png_raw(2, 2, 3, rows, [(b"PLTE", pal.tobytes())])
        )
        np.testing.assert_array_equal(out, pal[idx])

    def test_corrupt_and_unsupported_reject(self):
        from noaa_oracle_spark.pipeline.media_codecs import (
            decode_png,
            encode_png,
        )

        img = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
        good = encode_png(img)
        with pytest.raises(ValueError):
            decode_png(good[:40])  # truncated
        with pytest.raises(ValueError):
            decode_png(b"\x89PNG\r\n\x1a\nnot chunks")
        # interlaced flag
        import zlib

        bad = bytearray(good)
        bad[8 + 8 + 12] = 1  # IHDR interlace byte
        with pytest.raises(ValueError, match="interlaced"):
            decode_png(bytes(bad))
        # 16-bit depth
        bad = bytearray(good)
        bad[8 + 8 + 8] = 16  # IHDR bit-depth byte
        with pytest.raises(ValueError, match="bit depth"):
            decode_png(bytes(bad))
        # palette with missing PLTE
        rows = b"\x00\x00\x00"  # 2 px indices + filter? (w=2,h=1)
        with pytest.raises(ValueError, match="PLTE"):
            decode_png(_png_raw(2, 1, 3, rows))

    def test_spark_raster_path_accepts_png(self, spark):
        img = RNG.integers(0, 256, (6, 4, 3), dtype=np.uint8)
        rows = [
            (10, "image", _png_bytes_independent(img), "image/png",
             4, 6, None),
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        dec = decode_images(media).collect()[0]
        assert (dec["format"], dec["width"], dec["height"]) == ("png", 4, 6)
        assert abs(dec["mean_r"] - img[:, :, 0].mean()) < 1e-9
        feats = extract_image_features(media, dim=12, codec="raster")
        assert feats.collect()[0]["feature"] == pytest.approx(
            grid_features(img, 12)
        )
