"""Baseline JPEG codec: spec-level decode checks with numpy oracles.

Lossy codecs can't round-trip exactly, so exactness anchors where the math
IS exact: a solid color is a DC-only block whose reconstruction error is
bounded by half a quantization step; restart markers change the entropy
coding but not one dequantized coefficient, so RST and non-RST encodings
of the same image must decode IDENTICALLY. Smooth/noise images get error
bounds; structural variants (4:2:0, odd geometry, grayscale, fill bytes)
each exercise a distinct decoder path; malformed/unsupported streams must
raise ValueError (the NULL-degrade contract of the media operators).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from noaa_oracle_spark.pipeline.jpeg_codec import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_LUMA,
    _BitWriter,
    _build_encode_table,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
)
from noaa_oracle_spark.pipeline.media_codecs import (
    decode_image,
    sniff_image_format,
)

RNG = np.random.default_rng(11)


def test_solid_gray_is_exact():
    img = np.full((16, 24, 3), 128, np.uint8)
    data = encode_jpeg(img, 90)
    assert sniff_image_format(data) == "jpeg"
    out = decode_jpeg(data)
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, img)


def test_solid_colors_within_dc_quant_step():
    for color in [(200, 50, 90), (10, 10, 240), (255, 255, 255)]:
        img = np.zeros((8, 8, 3), np.uint8)
        img[:] = color
        out = decode_jpeg(encode_jpeg(img, 90))
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= 3, (color, err)


def test_gradient_and_noise_error_bounds():
    x = np.linspace(0, 255, 64)
    grad = np.zeros((32, 64, 3), np.uint8)
    grad[..., 0] = x[None, :].astype(np.uint8)
    grad[..., 1] = np.linspace(0, 255, 32)[:, None].astype(np.uint8)
    grad[..., 2] = 80
    gerr = np.abs(
        decode_jpeg(encode_jpeg(grad, 95)).astype(int) - grad.astype(int)
    )
    assert gerr.max() <= 4
    noise = RNG.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    nerr = np.abs(
        decode_jpeg(encode_jpeg(noise, 95)).astype(int) - noise.astype(int)
    )
    assert nerr.max() <= 32 and nerr.mean() <= 8


def test_restart_markers_decode_identically():
    """RSTn + predictor resets re-code the SAME coefficients — decoded
    pixels must match the no-restart encoding bit for bit."""
    img = RNG.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, 85))
    with_rst = decode_jpeg(encode_jpeg(img, 85, restart_interval=3))
    np.testing.assert_array_equal(plain, with_rst)


def test_420_subsampling_paths():
    # chroma-flat image: 4:2:0's chroma pooling loses nothing
    gray_ramp = np.repeat(
        np.linspace(0, 255, 64).astype(np.uint8)[None, :, None], 3, axis=2
    )
    gray_ramp = np.repeat(gray_ramp, 32, axis=0)
    full = decode_jpeg(encode_jpeg(gray_ramp, 95))
    sub = decode_jpeg(encode_jpeg(gray_ramp, 95, subsample=True))
    assert np.abs(sub.astype(int) - full.astype(int)).max() <= 2
    # colored + odd geometry + restarts: every MCU-geometry branch at once
    img = RNG.integers(0, 256, (19, 27, 3), dtype=np.uint8)
    out = decode_jpeg(
        encode_jpeg(img, 90, subsample=True, restart_interval=2)
    )
    assert out.shape == (19, 27, 3)
    # chroma is quartered, so RGB error on noise is large by design; LUMA
    # is not subsampled — it must stay close
    def luma(a):
        return (
            0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        )

    lerr = np.abs(luma(out.astype(float)) - luma(img.astype(float)))
    assert lerr.mean() <= 10


def _grayscale_dc_jpeg(value: int, h: int = 8, w: int = 8) -> bytes:
    """Hand-assembled 1-component DC-only JPEG: one block, DC diff coded
    with the Annex-K luma tables — written against the spec in THIS test,
    independent of the module's 3-component encoder."""
    q = QUANT_LUMA  # unscaled Annex table (quality 50)
    dc = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    blocks_y, blocks_x = -(-h // 8), -(-w // 8)
    pred = 0
    for _ in range(blocks_y * blocks_x):
        coef = int(round(8 * (value - 128) / int(q[0])))
        t, bits = _magnitude(coef - pred)
        pred = coef
        code, ln = dc[t]
        bw.write(code, ln)
        if t:
            bw.write(bits, t)
        code, ln = ac[0x00]  # EOB
        bw.write(code, ln)
    bw.flush()

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(int(x) for x in q))
        + seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def test_grayscale_single_component():
    data = _grayscale_dc_jpeg(200, 16, 8)
    out = decode_jpeg(data)
    assert out.shape == (16, 8, 3)
    # DC quantization step is 16 → reconstruction within half a step
    assert np.all(np.abs(out.astype(int) - 200) <= 8)
    # all three RGB channels equal (gray replication)
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.array_equal(out[..., 1], out[..., 2])


def test_decode_image_dispatch():
    img = np.full((8, 8, 3), 77, np.uint8)
    out = decode_image(encode_jpeg(img, 90))
    assert np.abs(out.astype(int) - 77).max() <= 3


def test_malformed_and_unsupported_reject():
    img = np.full((8, 8, 3), 90, np.uint8)
    good = bytearray(encode_jpeg(img, 90))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[: len(good) // 2]))  # truncated mid-stream
    # flip SOF0 → SOF2: progressive now DECODES, but a baseline scan
    # header (Ss=0, Se=63) is malformed for a progressive DC scan
    idx = bytes(good).find(b"\xff\xc0")
    prog = good.copy()
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(bytes(prog))
    # SOF1 (extended sequential) stays unsupported
    seq1 = good.copy()
    seq1[idx + 1] = 0xC1
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(seq1))
    # 12-bit precision
    deep = good.copy()
    deep[idx + 4] = 12
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg(bytes(deep))


def test_spark_raster_path_accepts_jpeg(spark):
    from noaa_oracle_spark.pipeline.media_codecs import grid_features
    from noaa_oracle_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        decode_images,
        extract_image_features,
    )

    img = RNG.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    blob = encode_jpeg(img, 90)
    media = spark.createDataFrame(
        [(20, "image", blob, "image/jpeg", 16, 12, None)], MEDIA_SCHEMA
    )
    dec = decode_images(media).collect()[0]
    assert (dec["format"], dec["width"], dec["height"]) == ("jpeg", 16, 12)
    feats = extract_image_features(media, dim=12, codec="raster").collect()
    assert feats[0]["feature"] == pytest.approx(
        grid_features(decode_jpeg(blob), 12)
    )


def test_corrupt_streams_degrade_to_valueerror_not_task_kill():
    """Every corruption class converts to ValueError — the media
    operators' 'corrupt blob → NULL column, never a task kill' contract.
    Previously _RestartMarker (stray RST inside entropy data) and
    KeyError (scan referencing an undefined DHT/DQT table) escaped."""
    img = np.full((8, 8, 3), 90, np.uint8)
    good = bytes(encode_jpeg(img, 90))

    # stray RST marker injected into the entropy-coded scan data
    sos = good.find(b"\xff\xda")
    scan_start = sos + 2 + struct.unpack(">H", good[sos + 2 : sos + 4])[0]
    stray = good[: scan_start + 2] + b"\xff\xd3" + good[scan_start + 2 :]
    with pytest.raises(ValueError, match="corrupt"):
        decode_jpeg(stray)

    # DHT segment excised: the scan references a Huffman table that was
    # never defined
    dht = good.find(b"\xff\xc4")
    dht_len = struct.unpack(">H", good[dht + 2 : dht + 4])[0]
    no_dht = good[:dht] + good[dht + 2 + dht_len :]
    with pytest.raises(ValueError):
        decode_jpeg(no_dht)


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_equals_baseline_bit_for_bit():
    """The two encoders quantize identically, so progressive and
    baseline decodes of the same image must agree EXACTLY — every scan
    kind of the 10-scan script (DC first/refine, AC bands, AC refine)
    must reassemble the same coefficients."""
    from noaa_oracle_spark.pipeline.jpeg_codec import (
        encode_jpeg_progressive,
    )

    imgs = [
        np.full((16, 24, 3), 128, np.uint8),
        RNG.integers(0, 256, (24, 17, 3), dtype=np.uint8),  # odd width
        RNG.integers(0, 256, (13, 8, 3), dtype=np.uint8),   # odd height
        np.stack(
            [np.tile(np.arange(40, dtype=np.uint8) * 6, (19, 1))] * 3, 2
        ),
    ]
    for q in (70, 90):
        for img in imgs:
            base = decode_jpeg(encode_jpeg(img, q))
            prog = decode_jpeg(encode_jpeg_progressive(img, q))
            np.testing.assert_array_equal(base, prog)


def test_progressive_spectral_only_script():
    """Spectral selection without successive approximation (Al=0
    everywhere) — a distinct scan-script shape real encoders emit."""
    from noaa_oracle_spark.pipeline.jpeg_codec import (
        encode_jpeg_progressive,
    )

    img = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    scans = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 5, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
        ([0], 6, 63, 0, 0),
    ]
    base = decode_jpeg(encode_jpeg(img, 85))
    prog = decode_jpeg(encode_jpeg_progressive(img, 85, scans=scans))
    np.testing.assert_array_equal(base, prog)


def test_progressive_truncated_and_corrupt_degrade():
    from noaa_oracle_spark.pipeline.jpeg_codec import (
        encode_jpeg_progressive,
    )

    img = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = encode_jpeg_progressive(img, 85)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 3])
    # a progressive stream that ends before any SOS
    sos = data.find(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(data[:sos] + b"\xff\xd9")


def test_progressive_eob_run_across_blocks():
    """Hand-built single-component stream exercising a multi-block EOB
    run (EOBn, r>0) — the Annex-K tables define no EOBn symbols, so the
    script-encoder fixtures can't produce one; this stream carries a
    custom DHT. 4 blocks: block 0 has one AC coefficient, blocks 1-3
    are AC-empty via EOB3 (run of 3). Oracle: dequant+IDCT in numpy."""
    import struct as _s

    from noaa_oracle_spark.pipeline.jpeg_codec import (
        _BitWriter,
        _C,
        ZIGZAG,
    )

    # custom AC table: symbols EOB0(0x00), EOB1(0x10), (r=0,s=1)=0x01,
    # ZRL(0xF0) — 4 symbols, all 3 bits (canonical codes 000..011)
    ac_bits = [0, 0, 4] + [0] * 13
    ac_vals = [0x00, 0x10, 0x01, 0xF0]
    # DC table: categories 0..3 at 2 bits
    dc_bits = [0, 4] + [0] * 14
    dc_vals = [0, 1, 2, 3]
    q = bytes([1] * 64)  # flat quant: coefficients pass through

    def seg(marker, payload):
        return _s.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    hdr = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + q)
        + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + seg(0xC2, _s.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
    )
    # scan 1: DC first, Al=0 — all four DC diffs zero (category 0 = code 00)
    bw = _BitWriter()
    for _ in range(4):
        bw.write(0b00, 2)
    bw.flush()
    scan1 = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + bytes(bw.out)
    # scan 2: AC first 1..63, Al=0. Block 0: (r=0,s=1) coef +1 at k=1,
    # then EOB0. Blocks 1-3: one EOB1 = run of 2... EOBn: r=1 →
    # run = (1<<1) + 1 extra bit; emit extra bit 1 → run 3.
    bw = _BitWriter()
    bw.write(0b010, 3)  # symbol 0x01: r=0,s=1
    bw.write(1, 1)      # magnitude bit: +1
    bw.write(0b000, 3)  # EOB0 ends block 0
    bw.write(0b001, 3)  # EOB1: run = 2 + extra
    bw.write(1, 1)      # extra bit → EOBRUN = 3 (blocks 1,2,3)
    bw.flush()
    scan2 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + bytes(bw.out)
    data = hdr + scan1 + scan2 + b"\xff\xd9"

    out = decode_jpeg(data)
    assert out.shape == (8, 32, 3)
    # numpy oracle: block 0 has coef 1 at zigzag k=1, others all-zero
    coef = np.zeros(64)
    coef[1] = 1.0
    blk = np.zeros((8, 8))
    blk.flat[ZIGZAG] = coef
    px = _C.T @ blk @ _C
    expect0 = np.clip(np.round(px + 128.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out[:, :8, 0], expect0)
    assert np.all(out[:, 8:, 0] == 128)  # EOB-run blocks: DC-only gray
    assert np.array_equal(out[..., 0], out[..., 1])


def test_progressive_spark_media_path(spark):
    """The multimodal raster path accepts progressive blobs end-to-end
    (sniff → decode → features) — the gate list shrinks to MP3/MP4."""
    from noaa_oracle_spark.pipeline.jpeg_codec import (
        encode_jpeg_progressive,
    )
    from noaa_oracle_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        decode_images,
    )

    img = RNG.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    blob = encode_jpeg_progressive(img, 90)
    assert sniff_image_format(blob) == "jpeg"
    media = spark.createDataFrame(
        [(21, "image", blob, "image/jpeg", 16, 12, None)], MEDIA_SCHEMA
    )
    dec = decode_images(media).collect()[0]
    assert (dec["format"], dec["width"], dec["height"]) == ("jpeg", 16, 12)


def test_progressive_restart_markers_dc_scan():
    """Hand-built progressive stream with DRI=2: the DC-first scan's
    restart path must byte-align, consume RSTn, and reset predictors.
    4 blocks of distinct grays; predictors reset at blocks 2 (RST0).
    Oracle: the gray values themselves."""
    import struct as _s

    from noaa_oracle_spark.pipeline.jpeg_codec import (
        _BitWriter,
        _build_encode_table,
        _magnitude,
    )

    dc_bits = [0, 0, 8] + [0] * 13  # categories 0..7 at 3 bits
    dc_vals = list(range(8))
    ac_bits = [0, 1] + [0] * 14
    ac_vals = [0x00]
    q = bytes([1] * 64)
    dc_enc = _build_encode_table(dc_bits, dc_vals)

    grays = [128, 130, 126, 132]  # DC coefs: (g-128)*8 quant 1
    coefs = [(g - 128) * 8 for g in grays]

    def seg(marker, payload):
        return _s.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    hdr = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + q)
        + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + seg(0xDD, _s.pack(">H", 2))  # DRI: restart every 2 MCUs
        + seg(0xC2, _s.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
    )
    body = bytearray()
    bw = _BitWriter()
    pred = 0
    for i, c in enumerate(coefs):
        if i == 2:  # restart boundary: flush, emit RST0, reset predictor
            bw.flush()
            body += bytes(bw.out)
            body += b"\xff\xd0"
            bw = _BitWriter()
            pred = 0
        t, bits = _magnitude(c - pred)
        pred = c
        code, ln = dc_enc[t]
        bw.write(code, ln)
        if t:
            bw.write(bits, t)
    bw.flush()
    body += bytes(bw.out)
    data = (
        hdr
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        + bytes(body)
        + b"\xff\xd9"
    )
    out = decode_jpeg(data)
    assert out.shape == (8, 32, 3)
    for i, g in enumerate(grays):
        block = out[:, i * 8 : (i + 1) * 8, 0]
        assert np.all(block == g), (i, g, block[0, 0])
