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
