"""MPEG audio frame walk: header math, stream walk, ID3 handling, and
the Spark operators — fixtures from the module's own frame builder."""

from __future__ import annotations

import pytest

from noaa_oracle_spark.pipeline.mp3 import (
    Mp3Error,
    build_mp3,
    mp3_frame_manifest,
    mp3_metadata,
    parse_frame_header,
    parse_mp3,
)


def test_header_math_layer3_mpeg1():
    blob = build_mp3(1, bitrate_kbps=128, sample_rate=44100)
    hdr = parse_frame_header(blob, 0)
    assert hdr["version"] == "MPEG1" and hdr["layer"] == "III"
    assert hdr["bitrate"] == 128000 and hdr["sample_rate"] == 44100
    assert hdr["size"] == 144 * 128000 // 44100  # 417, no padding
    assert hdr["samples"] == 1152


def test_walk_counts_frames_and_duration():
    blob = build_mp3(38, bitrate_kbps=192, sample_rate=48000)
    info = parse_mp3(blob)
    assert len(info["frames"]) == 38
    # contiguous frames: each offset = previous offset + size
    pos = 0
    for fr in info["frames"]:
        assert fr["offset"] == pos
        pos += fr["size"]
    assert info["duration_ms"] == 38 * 1152 * 1000 // 48000
    assert info["avg_bitrate"] == 192000


def test_mixed_sample_rate_duration_accumulates_per_frame():
    """Round-6 ADVICE (low): a stream that legally switches sample rate
    mid-way must not have its duration computed as grand-total samples
    over the LAST frame's rate — duration accumulates per frame."""
    a = build_mp3(10, bitrate_kbps=128, sample_rate=32000)  # MPEG1 ladder
    b = build_mp3(10, bitrate_kbps=128, sample_rate=44100)
    info = parse_mp3(a + b)
    assert len(info["frames"]) == 20
    want = (
        10 * (1152 * 1_000_000 // 32000) + 10 * (1152 * 1_000_000 // 44100)
    ) // 1000
    assert want == 621  # old last-rate math would have said 522
    assert info["duration_ms"] == want


def test_id3v2_skip_and_truncation_prefix():
    blob = build_mp3(10, id3v2_bytes=77)
    info = parse_mp3(blob)
    assert len(info["frames"]) == 10
    assert info["frames"][0]["offset"] == 10 + 77
    # cut mid-frame: prefix survives
    cut = info["frames"][6]["offset"] + 5
    assert len(parse_mp3(blob[:cut])["frames"]) == 6


def test_id3v24_footer_flag_skips_extra_ten_bytes():
    """An ID3v2.4 tag with the footer flag (byte 5, bit 0x10) occupies
    header(10) + size + footer(10); skipping it 10 short lands the sync
    scan on the '3DI' footer and drops a decodable stream."""
    frames = build_mp3(4)
    body = 40
    tag = (
        b"ID3"
        + bytes([4, 0, 0x10])  # v2.4, footer flag set
        + bytes(
            [(body >> 21) & 0x7F, (body >> 14) & 0x7F,
             (body >> 7) & 0x7F, body & 0x7F]
        )
        + bytes(body)
        + b"3DI" + bytes([4, 0, 0x10]) + bytes(4)  # 10-byte footer
    )
    info = parse_mp3(tag + frames)
    assert len(info["frames"]) == 4
    assert info["frames"][0]["offset"] == 10 + body + 10


def test_not_mp3_raises():
    with pytest.raises(Mp3Error):
        parse_mp3(b"")
    with pytest.raises(Mp3Error):
        parse_mp3(b"certainly not mpeg audio bytes" * 10)


def test_operators_and_degradation(spark):
    good = build_mp3(12, bitrate_kbps=128, sample_rate=44100)
    other = build_mp3(5, bitrate_kbps=64, sample_rate=32000)
    df = spark.createDataFrame(
        [(1, good), (2, other), (3, b"junk" * 50), (4, None)],
        "media_id long, content binary",
    )
    man = mp3_frame_manifest(df).collect()
    by_media = {}
    for r in man:
        by_media.setdefault(r.media_id, []).append(r)
    assert len(by_media[1]) == 12 and len(by_media[2]) == 5
    assert 3 not in by_media and 4 not in by_media
    assert all(r.size_bytes == 144 * 128000 // 44100 for r in by_media[1])

    meta = {r.media_id: r for r in mp3_metadata(df).collect()}
    assert meta[1].duration_ms == 12 * 1152 * 1000 // 44100
    assert meta[2].sample_rate == 32000 and meta[2].n_frames == 5

    plan = (
        mp3_frame_manifest(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Layer III side information (ISO 11172-3 2.4.1.7 + 13818-3 LSF layout)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            b <<= max(0, 8 - len(self.bits[i : i + 8]))
            out.append(b)
        return bytes(out)


def _mp3_header(version=3, mode=3, protection=1, bidx=9, rate_idx=0):
    import struct

    h = (
        (0x7FF << 21) | (version << 19) | (1 << 17) | (protection << 16)
        | (bidx << 12) | (rate_idx << 10) | (0 << 9) | (mode << 6)
    )
    return struct.pack(">I", h)


def test_side_info_zeroed_silent_frame():
    from noaa_oracle_spark.pipeline.mp3 import (
        build_mp3,
        parse_mp3,
        parse_side_info,
    )

    blob = build_mp3(3, side_info=True)
    # the side_info variant stays a valid walkable stream
    assert len(parse_mp3(blob)["frames"]) == 3
    si = parse_side_info(blob, 0)
    assert si["main_data_begin"] == 0 and si["private_bits"] == 0
    assert si["scfsi"] == [[0, 0, 0, 0]]
    assert len(si["granules"]) == 2 and len(si["granules"][0]) == 1
    for gr in si["granules"]:
        g = gr[0]
        assert g["big_values"] == 0 and g["global_gain"] == 0
        assert g["window_switching"] == 0 and g["block_type"] == 0
        assert g["table_select"] == [0, 0, 0]
        assert g["region0_count"] == 0 and g["preflag"] == 0


def _granule_bits(w, part23=0, big=0, gain=0, sfc=0, switched=False):
    w.put(part23, 12).put(big, 9).put(gain, 8).put(sfc, 4)
    if switched:
        w.put(1, 1).put(2, 2).put(0, 1)  # short block, not mixed
        w.put(13, 5).put(7, 5)  # 2 table selects
        w.put(1, 3).put(2, 3).put(3, 3)  # subblock gains
    else:
        w.put(0, 1)
        w.put(13, 5).put(7, 5).put(24, 5)
        w.put(5, 4).put(3, 3)
    w.put(1, 1).put(1, 1).put(1, 1)  # preflag, sf_scale, count1 select
    return w


def test_side_info_known_bit_pattern_mono_with_switched_granule():
    from noaa_oracle_spark.pipeline.mp3 import parse_side_info

    w = _BitWriter()
    w.put(257, 9).put(0b10101, 5)  # main_data_begin, private
    w.put(0b1010, 4)  # scfsi
    _granule_bits(w, part23=1234, big=100, gain=200, sfc=9, switched=False)
    _granule_bits(w, part23=555, big=7, gain=31, sfc=2, switched=True)
    body = w.bytes()
    assert len(body) == 17  # the structural checksum, by construction
    blob = _mp3_header() + body + bytes(100)
    si = parse_side_info(blob, 0)
    assert si["main_data_begin"] == 257 and si["private_bits"] == 0b10101
    assert si["scfsi"] == [[1, 0, 1, 0]]
    g0, g1 = si["granules"][0][0], si["granules"][1][0]
    assert (g0["part2_3_length"], g0["big_values"], g0["global_gain"]) == (
        1234, 100, 200,
    )
    assert g0["table_select"] == [13, 7, 24]
    assert (g0["region0_count"], g0["region1_count"]) == (5, 3)
    assert g1["window_switching"] == 1 and g1["block_type"] == 2
    assert g1["table_select"] == [13, 7]
    assert g1["subblock_gain"] == [1, 2, 3]
    assert g1["region0_count"] is None  # implicit, spectral-layer scope
    assert (g1["preflag"], g1["scalefac_scale"], g1["count1table_select"]) == (
        1, 1, 1,
    )


def test_side_info_stereo_and_crc_offset():
    from noaa_oracle_spark.pipeline.mp3 import parse_side_info

    w = _BitWriter()
    w.put(100, 9).put(0b101, 3)  # stereo private = 3 bits
    w.put(0b1100, 4).put(0b0011, 4)  # scfsi per channel
    for _ in range(4):  # 2 granules x 2 channels
        _granule_bits(w)
    body = w.bytes()
    assert len(body) == 32
    # protection=0: a 16-bit CRC sits between header and side info
    blob = _mp3_header(mode=0, protection=0) + b"\xde\xad" + body + bytes(64)
    si = parse_side_info(blob, 0)
    assert si["main_data_begin"] == 100 and si["private_bits"] == 0b101
    assert si["scfsi"] == [[1, 1, 0, 0], [0, 0, 1, 1]]
    assert len(si["granules"]) == 2 and len(si["granules"][0]) == 2


def test_side_info_lsf_mono_is_nine_bytes():
    from noaa_oracle_spark.pipeline.mp3 import parse_side_info

    w = _BitWriter()
    w.put(77, 8).put(1, 1)  # LSF: 8-bit main_data_begin, 1 private bit
    # one granule: 9-bit scalefac_compress, no preflag
    w.put(444, 12).put(22, 9).put(99, 8).put(300, 9)
    w.put(0, 1)  # normal block
    w.put(13, 5).put(7, 5).put(24, 5)
    w.put(5, 4).put(3, 3)
    w.put(1, 1).put(0, 1)  # sf_scale, count1 select (no preflag in LSF)
    body = w.bytes()
    assert len(body) == 9
    # MPEG2 header: version bits 2, 22.05 kHz family
    blob = _mp3_header(version=2) + body + bytes(64)
    si = parse_side_info(blob, 0)
    assert si["main_data_begin"] == 77 and si["private_bits"] == 1
    assert len(si["granules"]) == 1
    g = si["granules"][0][0]
    assert g["scalefac_compress"] == 300 and g["preflag"] == 0
    assert g["scalefac_scale"] == 1 and g["count1table_select"] == 0


def test_side_info_rejects_truncation_and_wrong_layer():
    import struct

    from noaa_oracle_spark.pipeline.mp3 import Mp3Error, parse_side_info

    with pytest.raises(Mp3Error):
        parse_side_info(_mp3_header() + bytes(5), 0)  # truncated block
    layer2 = struct.pack(
        ">I",
        (0x7FF << 21) | (3 << 19) | (2 << 17) | (1 << 16) | (9 << 12)
        | (0 << 10) | (3 << 6),
    )
    with pytest.raises(Mp3Error):
        parse_side_info(layer2 + bytes(64), 0)
    with pytest.raises(Mp3Error):
        parse_side_info(bytes(16), 0)  # no sync
