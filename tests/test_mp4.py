"""MP4 / ISO-BMFF container demux: box walk, sample-table resolution,
payload slicing, and the Spark operators — fixtures built by the module's
own minimal muxer (the PNG-encoder discipline: no binary fixtures)."""

from __future__ import annotations

import struct

import pytest

from noaa_oracle_spark.pipeline.mp4 import (
    Mp4Error,
    build_mp4,
    demux_mp4_samples,
    mp4_samples,
    mp4_track_metadata,
    parse_mp4,
)


def _video_payloads(n=7, base=40):
    return [bytes([i]) * (base + 13 * i) for i in range(n)]


def _two_track_blob(use_co64=False, samples_per_chunk=2, faststart=False):
    vide = {
        "handler": "vide",
        "codec": "avc1",
        "timescale": 30000,
        "width": 640,
        "height": 360,
        "samples": [(p, 1001) for p in _video_payloads()],
    }
    soun = {
        "handler": "soun",
        "codec": "mp4a",
        "timescale": 48000,
        "channels": 2,
        "sample_rate": 48000,
        "samples": [(bytes([0x80 + i]) * 23, 1024) for i in range(5)],
    }
    return build_mp4(
        [vide, soun],
        samples_per_chunk=samples_per_chunk,
        use_co64=use_co64,
        faststart=faststart,
    )


def test_parse_structure_and_geometry():
    blob = _two_track_blob()
    info = parse_mp4(blob)
    assert info["brand"] == "isom"
    assert len(info["tracks"]) == 2
    v, a = info["tracks"]
    assert (v["handler"], v["codec"]) == ("vide", "avc1")
    assert (v["width"], v["height"]) == (640, 360)
    assert v["timescale"] == 30000 and v["duration"] == 7 * 1001
    assert (a["handler"], a["codec"]) == ("soun", "mp4a")
    assert (a["channels"], a["sample_rate"]) == (2, 48000)
    assert len(v["sizes"]) == 7 and len(a["sizes"]) == 5


@pytest.mark.parametrize("use_co64", [False, True])
@pytest.mark.parametrize("spc", [1, 2, 3, 100])
def test_demux_round_trip_exact_bytes(use_co64, spc):
    """Every chunking layout and both offset-box widths resolve every
    sample back to its exact payload bytes."""
    blob = _two_track_blob(use_co64=use_co64, samples_per_chunk=spc)
    info = parse_mp4(blob)
    v = info["tracks"][0]
    samples = mp4_samples(v)
    want = _video_payloads()
    assert len(samples) == len(want)
    dts = 0
    for s, w in zip(samples, want):
        assert blob[s["offset"] : s["offset"] + s["size"]] == w
        assert s["dts"] == dts and s["duration"] == 1001
        dts += 1001


def test_stts_runs_and_varied_durations():
    tr = {
        "handler": "vide",
        "codec": "avc1",
        "timescale": 1000,
        "width": 16,
        "height": 16,
        "samples": [(b"a" * 10, 33), (b"b" * 10, 33), (b"c" * 10, 34),
                    (b"d" * 10, 33)],
    }
    info = parse_mp4(build_mp4([tr]))
    # run-length stts: 2×33, 1×34, 1×33 → three runs
    assert info["tracks"][0]["stts"] == [(2, 33), (1, 34), (1, 33)]
    assert [s["dts"] for s in mp4_samples(info["tracks"][0])] == [
        0, 33, 66, 100,
    ]


def test_not_mp4_raises():
    with pytest.raises(Mp4Error):
        parse_mp4(b"")
    with pytest.raises(Mp4Error):
        parse_mp4(b"this is definitely not an iso-bmff container....")


def test_faststart_layout_round_trips():
    """moov-before-mdat (streaming layout): identical parse + demux."""
    blob = _two_track_blob(faststart=True)
    assert blob.index(b"moov") < blob.index(b"mdat")
    info = parse_mp4(blob)
    v = info["tracks"][0]
    for s, w in zip(mp4_samples(v), _video_payloads()):
        assert blob[s["offset"] : s["offset"] + s["size"]] == w


def test_truncated_mdat_salvages_prefix():
    # classic layout truncated mid-mdat loses moov entirely: a
    # legitimately truncated download parses to zero tracks, not a crash
    blob = _two_track_blob()
    info_full = parse_mp4(blob)
    cut = mp4_samples(info_full["tracks"][0])[3]["offset"]
    assert parse_mp4(blob[:cut])["tracks"] == []

    # faststart truncated mid-mdat keeps the index and loses media
    # bytes: samples before the cut resolve, the rest are skipped
    fast = _two_track_blob(faststart=True)
    v = parse_mp4(fast)["tracks"][0]
    samples = mp4_samples(v)
    cut = samples[3]["offset"]
    short = fast[:cut]
    v_short = parse_mp4(short)["tracks"][0]
    resolved = [
        s
        for s in mp4_samples(v_short)
        if s["offset"] + s["size"] <= len(short)
    ]
    assert [s["idx"] for s in resolved] == [0, 1, 2]


def test_operators_emit_metadata_and_payloads(spark):
    blob1 = _two_track_blob()
    blob2 = build_mp4(
        [
            {
                "handler": "vide",
                "codec": "hvc1",
                "timescale": 90000,
                "width": 1920,
                "height": 1080,
                "samples": [(b"x" * 100, 3000)] * 4,
            }
        ],
        use_co64=True,
    )
    df = spark.createDataFrame(
        [(1, blob1), (2, blob2)], "media_id long, content binary"
    )
    meta = mp4_track_metadata(df).collect()
    by_key = {(r.media_id, r.handler, r.codec): r for r in meta}
    assert len(meta) == 3
    r = by_key[(1, "vide", "avc1")]
    assert (r.width, r.height, r.n_samples) == (640, 360, 7)
    assert r.duration_ms == 7 * 1001 * 1000 // 30000
    r = by_key[(1, "soun", "mp4a")]
    assert (r.channels, r.sample_rate, r.n_samples) == (2, 48000, 5)
    r = by_key[(2, "vide", "hvc1")]
    assert (r.width, r.height, r.timescale) == (1920, 1080, 90000)

    sam = demux_mp4_samples(df, handler="vide").collect()
    got = {
        (r.media_id, r.sample_idx): bytes(r.payload)
        for r in sam
    }
    for i, p in enumerate(_video_payloads()):
        assert got[(1, i)] == p
    assert all(got[(2, i)] == b"x" * 100 for i in range(4))
    ms = {r.sample_idx: r.dts_ms for r in sam if r.media_id == 2}
    assert ms == {0: 0, 1: 33, 2: 66, 3: 100}  # 3000/90000 ticks → ms


def test_operators_degrade_on_garbage(spark):
    good = _two_track_blob()
    # faststart blob truncated mid-mdat: the index survives, samples
    # whose bytes were lost must be skipped — not crash the task
    fast = _two_track_blob(faststart=True)
    cut = mp4_samples(parse_mp4(fast)["tracks"][0])[2]["offset"]
    short = fast[:cut]

    df = spark.createDataFrame(
        [(1, good), (2, short), (3, b"garbage" * 10), (4, None)],
        "media_id long, content binary",
    )
    sam = demux_mp4_samples(df, handler="vide").collect()
    by_media = {}
    for r in sam:
        by_media.setdefault(r.media_id, []).append(r)
    assert len(by_media[1]) == 7
    # the shortened blob keeps only the samples whose bytes survived
    assert {r.sample_idx for r in by_media[2]} == {0, 1}
    assert 3 not in by_media and 4 not in by_media
    assert mp4_track_metadata(df).filter("media_id >= 3").count() == 0


def test_demux_is_map_side(spark):
    df = spark.createDataFrame(
        [(1, _two_track_blob())], "media_id long, content binary"
    )
    plan = (
        demux_mp4_samples(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # blobs never cross a shuffle
