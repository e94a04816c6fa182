"""MP4 / ISO-BMFF (ISO 14496-12) container demux on stdlib bytes alone.

The distributed part of a video pipeline is the CONTAINER walk: finding
per-track sample (frame) payloads, timing, and geometry inside a blob so
frames can be sampled, bucketed, and routed WITHOUT an external media
library. This module implements that walk — the box tree (ftyp/moov/trak/
mdia/minf/stbl), the sample tables (stsd, stts, stsc, stsz, stco/co64),
and sample payload slicing out of mdat — plus the matching minimal muxer
(the PNG-encoder discipline: tests build their own fixtures byte-for-byte
rather than shipping binaries).

What stays gated: decoding the sliced payloads (H.264/HEVC/AAC entropy
decode) genuinely needs codec libraries this runtime doesn't ship;
`extract_image_features`/`sample_video_frames` keep raising
NotImplementedError for those codecs (pipeline/multimodal.py). The demux
below is honest container work, not a decoder stub.

Scale shape: same rules as webdataset/multimodal — one mapInPandas kernel
per operator, blobs stay map-side, only small per-track / per-sample rows
(and, for demux, the sliced payload bytes that the caller asked for)
continue downstream. Corrupt or truncated containers degrade to the rows
that could be resolved instead of failing the task.

Box-walk scope notes: 64-bit sizes (size==1 largesize) and size==0
(to end-of-enclosure) are handled; ctts (composition offsets / B-frame
reordering) and fragmented MP4 (moof) are out of scope and documented as
such — samples carry DTS, not PTS.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


class Mp4Error(ValueError):
    pass


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for sibling boxes in
    data[start:end]; raises Mp4Error on malformed headers, stops cleanly
    at a truncation boundary."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4Error("truncated largesize header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            header = 16
        elif size == 0:
            size = end - pos  # box extends to end of enclosure
        if size < header:
            raise Mp4Error(f"box size {size} smaller than its header")
        if pos + size > end:
            # truncated final box: expose what is present
            yield btype, pos + header, end
            return
        yield btype, pos + header, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def _full(data: bytes, start: int) -> tuple[int, int]:
    """(version, flags) of a full box; payload begins at start+4."""
    v = data[start]
    fl = int.from_bytes(data[start + 1 : start + 4], "big")
    return v, fl


def _parse_stsd(data: bytes, s: int, e: int) -> dict:
    _, _ = _full(data, s)
    (count,) = struct.unpack_from(">I", data, s + 4)
    out: dict = {"codec": None, "width": None, "height": None,
                 "channels": None, "sample_rate": None}
    pos = s + 8
    if count >= 1 and pos + 16 <= e:
        entry_size = struct.unpack_from(">I", data, pos)[0]
        out["codec"] = data[pos + 4 : pos + 8].decode("latin1")
        body = pos + 16  # SampleEntry: 6 reserved + 2 data_ref_index
        if body + 70 <= pos + entry_size and body + 70 <= e:
            # VisualSampleEntry layout: 16 predefined/reserved bytes then
            # width(2) height(2) at offsets 16/18 past the entry header
            w, h = struct.unpack_from(">HH", data, body + 16)
            if 0 < w <= 16384 and 0 < h <= 16384:
                out["width"], out["height"] = int(w), int(h)
        if body + 20 <= pos + entry_size and body + 20 <= e:
            # AudioSampleEntry: reserved(8) channelcount(2) samplesize(2)
            # pre_defined(2) reserved(2) samplerate(4; 16.16 fixed)
            ch = struct.unpack_from(">H", data, body + 8)[0]
            sr = struct.unpack_from(">I", data, body + 16)[0] >> 16
            if out["width"] is None and 0 < ch <= 64 and sr > 0:
                out["channels"], out["sample_rate"] = int(ch), int(sr)
    return out


def _read_table(data: bytes, s: int, e: int, fmt: str, per: int):
    _, _ = _full(data, s)
    (count,) = struct.unpack_from(">I", data, s + 4)
    pos = s + 8
    rows = []
    for _ in range(count):
        if pos + per > e:
            break  # truncated table: keep the resolved prefix
        rows.append(struct.unpack_from(fmt, data, pos))
        pos += per
    return rows


def _parse_track(data: bytes, s: int, e: int) -> dict | None:
    tk = _find(data, s, e, b"tkhd")
    mdia = _find(data, s, e, b"mdia")
    if mdia is None:
        return None
    track: dict = {"track_id": None, "handler": None, "timescale": None,
                   "duration": None}
    if tk is not None:
        v, _ = _full(data, tk[0])
        # v0: ver/flags(4) ctime(4) mtime(4) track_id(4); v1 uses 8-byte times
        off = tk[0] + 4 + (16 if v == 1 else 8)
        track["track_id"] = struct.unpack_from(">I", data, off)[0]
    ms, me = mdia
    mdhd = _find(data, ms, me, b"mdhd")
    if mdhd is not None:
        v, _ = _full(data, mdhd[0])
        off = mdhd[0] + 4 + (16 if v == 1 else 8)
        track["timescale"] = struct.unpack_from(">I", data, off)[0]
        track["duration"] = (
            struct.unpack_from(">Q", data, off + 4)[0]
            if v == 1
            else struct.unpack_from(">I", data, off + 4)[0]
        )
    hdlr = _find(data, ms, me, b"hdlr")
    if hdlr is not None:
        track["handler"] = data[hdlr[0] + 8 : hdlr[0] + 12].decode("latin1")
    minf = _find(data, ms, me, b"minf")
    if minf is None:
        return track
    stbl = _find(data, minf[0], minf[1], b"stbl")
    if stbl is None:
        return track
    ss, se = stbl
    stsd = _find(data, ss, se, b"stsd")
    if stsd is not None:
        track.update(_parse_stsd(data, *stsd))
    stsz = _find(data, ss, se, b"stsz")
    if stsz is not None:
        v_s = stsz[0]
        uniform, count = struct.unpack_from(">II", data, v_s + 4)
        if uniform:
            track["sizes"] = [uniform] * count
        else:
            # _read_table skips one leading word (normally version/
            # flags) before its count word; passing v_s + 4 aligns that
            # skipped word onto stsz's uniform-size field, the count
            # onto sample_count (v_s + 8), and the entries onto v_s + 12
            # — exactly the stsz layout
            track["sizes"] = [
                r[0] for r in _read_table(data, v_s + 4, stsz[1], ">I", 4)
            ]
    stsc = _find(data, ss, se, b"stsc")
    track["stsc"] = (
        _read_table(data, *stsc, ">III", 12) if stsc is not None else []
    )
    stco = _find(data, ss, se, b"stco")
    co64 = _find(data, ss, se, b"co64")
    if co64 is not None:
        track["offsets"] = [
            r[0] for r in _read_table(data, *co64, ">Q", 8)
        ]
    elif stco is not None:
        track["offsets"] = [
            r[0] for r in _read_table(data, *stco, ">I", 4)
        ]
    stts = _find(data, ss, se, b"stts")
    track["stts"] = (
        _read_table(data, *stts, ">II", 8) if stts is not None else []
    )
    return track


def parse_mp4(data: bytes) -> dict:
    """Parse the box tree: {'brand', 'timescale', 'duration', 'tracks':
    [track dicts with sample tables]}. Raises Mp4Error when the blob is
    not ISO-BMFF at all; degrades to partial info on truncation."""
    if len(data) < 8:
        raise Mp4Error("too short for any box")
    top = list(_boxes(data, 0, len(data)))
    types = {t for t, _, _ in top}
    if b"ftyp" not in types and b"moov" not in types:
        raise Mp4Error("no ftyp/moov box: not ISO-BMFF")
    out: dict = {"brand": None, "timescale": None, "duration": None,
                 "tracks": []}
    for t, s, e in top:
        if t == b"ftyp" and e - s >= 4:
            out["brand"] = data[s : s + 4].decode("latin1")
        elif t == b"moov":
            for tt, ts, te in _boxes(data, s, e):
                if tt == b"mvhd":
                    v, _ = _full(data, ts)
                    off = ts + 4 + (16 if v == 1 else 8)
                    out["timescale"] = struct.unpack_from(">I", data, off)[0]
                    out["duration"] = (
                        struct.unpack_from(">Q", data, off + 4)[0]
                        if v == 1
                        else struct.unpack_from(">I", data, off + 4)[0]
                    )
                elif tt == b"trak":
                    tr = _parse_track(data, ts, te)
                    if tr is not None:
                        out["tracks"].append(tr)
    return out


def mp4_samples(track: dict) -> list[dict]:
    """Resolve one parsed track's sample tables into per-sample
    (idx, offset, size, dts, duration) — the stsc chunk-run expansion +
    within-chunk size accumulation + stts delta walk."""
    sizes = track.get("sizes") or []
    offsets = track.get("offsets") or []
    stsc = track.get("stsc") or []
    if not sizes or not offsets or not stsc:
        return []
    # expand stsc runs: entry i covers chunks [first_i, first_{i+1})
    samples_in_chunk = []
    for i, (first, per_chunk, _sdi) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(offsets)
        samples_in_chunk.extend(per_chunk for _ in range(first, last + 1))
    # dts walk
    deltas: list[int] = []
    for count, delta in track.get("stts") or []:
        deltas.extend(delta for _ in range(count))
    out = []
    si = 0
    dts = 0
    for ci, chunk_off in enumerate(offsets):
        if ci >= len(samples_in_chunk) or si >= len(sizes):
            break
        pos = chunk_off
        for _ in range(samples_in_chunk[ci]):
            if si >= len(sizes):
                break
            dur = deltas[si] if si < len(deltas) else 0
            out.append(
                {
                    "idx": si,
                    "offset": pos,
                    "size": sizes[si],
                    "dts": dts,
                    "duration": dur,
                }
            )
            pos += sizes[si]
            dts += dur
            si += 1
    return out


# ---------------------------------------------------------------------------
# minimal muxer — the test-fixture builder (and a valid-writer sanity proof
# of the table semantics above): one mdat, per-track stbl with real stsc
# chunk runs, stco or co64, uniform-or-per-sample stsz, stts runs.
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full_box(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + payload)


def build_mp4(
    tracks: "list[dict]",
    timescale: int = 1000,
    samples_per_chunk: int = 2,
    use_co64: bool = False,
    faststart: bool = False,
) -> bytes:
    """Mux sample payloads into a minimal valid ISO-BMFF blob.

    Each track dict: {'handler': 'vide'|'soun', 'codec': 4cc str,
    'timescale': int, 'samples': [(payload bytes, duration int)],
    optional 'width'/'height' or 'channels'/'sample_rate'}.  Chunks take
    `samples_per_chunk` samples each (the last chunk takes the remainder,
    exercising a 2-run stsc).  `faststart` writes moov BEFORE mdat (the
    streaming/progressive-download layout, where a truncated tail loses
    media bytes but keeps the index)."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")

    # lay out mdat: track-major, chunk-runs inside; offsets collected
    # RELATIVE to the mdat payload start, rebased once the final box
    # order (classic vs faststart) fixes the absolute position
    mdat_payload = bytearray()
    rel_offsets: list[list[int]] = []
    for tr in tracks:
        offs = []
        samples = tr["samples"]
        for c0 in range(0, len(samples), samples_per_chunk):
            offs.append(len(mdat_payload))
            for payload, _dur in samples[c0 : c0 + samples_per_chunk]:
                mdat_payload.extend(payload)
        rel_offsets.append(offs)
    mdat = _box(b"mdat", bytes(mdat_payload))

    def moov_at(base: int) -> bytes:
        chunk_offsets = [[base + o for o in offs] for offs in rel_offsets]
        return _build_moov(
            tracks, timescale, samples_per_chunk, use_co64, chunk_offsets
        )

    if faststart:
        # moov size is offset-value-independent (fixed-width stco/co64
        # entries), so size it with zeros then rebase
        moov_len = len(moov_at(0))
        moov = moov_at(len(ftyp) + moov_len + 8)
        return ftyp + moov + mdat
    moov = moov_at(len(ftyp) + 8)
    return ftyp + mdat + moov


def _build_moov(
    tracks: "list[dict]",
    timescale: int,
    samples_per_chunk: int,
    use_co64: bool,
    chunk_offsets: "list[list[int]]",
) -> bytes:
    total_dur = max(
        (
            sum(d for _, d in tr["samples"]) * timescale
            // max(tr.get("timescale", timescale), 1)
            for tr in tracks
        ),
        default=0,
    )
    mvhd = _full_box(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, total_dur)
        + struct.pack(">iH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(
            ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24
        + struct.pack(">I", len(tracks) + 1),
    )

    traks = b""
    for ti, tr in enumerate(tracks):
        samples = tr["samples"]
        tr_dur = sum(d for _, d in samples)
        tkhd = _full_box(
            b"tkhd",
            0,
            struct.pack(">IIIII", 0, 0, ti + 1, 0, tr_dur)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(
                ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
            )
            + struct.pack(
                ">II",
                (tr.get("width") or 0) << 16,
                (tr.get("height") or 0) << 16,
            ),
        )
        mdhd = _full_box(
            b"mdhd",
            0,
            struct.pack(
                ">IIII", 0, 0, tr.get("timescale", timescale), tr_dur
            )
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _full_box(
            b"hdlr",
            0,
            struct.pack(">I", 0)
            + tr["handler"].encode("latin1")
            + b"\x00" * 12
            + b"\x00",
        )
        codec = tr["codec"].encode("latin1")
        if tr["handler"] == "vide":
            entry = (
                b"\x00" * 6
                + struct.pack(">H", 1)
                + b"\x00" * 16
                + struct.pack(">HH", tr.get("width", 0), tr.get("height", 0))
                + struct.pack(">II", 0x00480000, 0x00480000)
                + struct.pack(">I", 0)
                + struct.pack(">H", 1)
                + b"\x00" * 32
                + struct.pack(">Hh", 24, -1)
            )
        else:
            entry = (
                b"\x00" * 6
                + struct.pack(">H", 1)
                + b"\x00" * 8
                + struct.pack(">HHHH", tr.get("channels", 1), 16, 0, 0)
                + struct.pack(">I", tr.get("sample_rate", 48000) << 16)
            )
        stsd = _full_box(
            b"stsd",
            0,
            struct.pack(">I", 1)
            + struct.pack(">I", 8 + len(entry))
            + codec
            + entry,
        )
        # stts: run-length encode consecutive equal durations
        runs: list[list[int]] = []
        for _, d in samples:
            if runs and runs[-1][1] == d:
                runs[-1][0] += 1
            else:
                runs.append([1, d])
        stts = _full_box(
            b"stts",
            0,
            struct.pack(">I", len(runs))
            + b"".join(struct.pack(">II", c, d) for c, d in runs),
        )
        # stsc: full chunks run + remainder run
        n = len(samples)
        full_chunks, rem = divmod(n, samples_per_chunk)
        entries = []
        if full_chunks:
            entries.append((1, samples_per_chunk, 1))
        if rem:
            entries.append((full_chunks + 1, rem, 1))
        stsc = _full_box(
            b"stsc",
            0,
            struct.pack(">I", len(entries))
            + b"".join(struct.pack(">III", *e) for e in entries),
        )
        sizes = [len(p) for p, _ in samples]
        uniform = sizes[0] if sizes and all(s == sizes[0] for s in sizes) else 0
        stsz = _full_box(
            b"stsz",
            0,
            struct.pack(">II", uniform, n)
            + (
                b""
                if uniform
                else b"".join(struct.pack(">I", s) for s in sizes)
            ),
        )
        offs = chunk_offsets[ti]
        if use_co64:
            co = _full_box(
                b"co64",
                0,
                struct.pack(">I", len(offs))
                + b"".join(struct.pack(">Q", o) for o in offs),
            )
        else:
            co = _full_box(
                b"stco",
                0,
                struct.pack(">I", len(offs))
                + b"".join(struct.pack(">I", o) for o in offs),
            )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + co)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks += _box(b"trak", tkhd + mdia)

    return _box(b"moov", mvhd + traks)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

MP4_TRACK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("brand", T.StringType(), True),
        T.StructField("track_id", T.LongType(), True),
        T.StructField("handler", T.StringType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("timescale", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), False),
    ]
)

MP4_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("track_id", T.LongType(), True),
        T.StructField("sample_idx", T.LongType(), False),
        T.StructField("dts_ms", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _dur_ms(units, timescale) -> "int | None":
    if units is None or not timescale:
        return None
    return int(units) * 1000 // int(timescale)


def mp4_track_metadata(media: DataFrame) -> DataFrame:
    """One row per (blob, track): codec fourcc, geometry/audio shape,
    timing. Blob-local, map-side; non-MP4 or corrupt blobs yield zero
    rows (the ppmstream convention)."""

    def kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    info = parse_mp4(bytes(blob) if blob is not None else b"")
                except Mp4Error:
                    continue
                for tr in info["tracks"]:
                    rows.append(
                        {
                            "media_id": mid,
                            "brand": info["brand"],
                            "track_id": tr.get("track_id"),
                            "handler": tr.get("handler"),
                            "codec": tr.get("codec"),
                            "width": tr.get("width"),
                            "height": tr.get("height"),
                            "channels": tr.get("channels"),
                            "sample_rate": tr.get("sample_rate"),
                            "timescale": tr.get("timescale"),
                            "duration_ms": _dur_ms(
                                tr.get("duration"), tr.get("timescale")
                            ),
                            "n_samples": len(tr.get("sizes") or []),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in MP4_TRACK_SCHEMA.fields],
            )

    return media.select("media_id", "content").mapInPandas(
        kernel, MP4_TRACK_SCHEMA
    )


def demux_mp4_samples(
    media: DataFrame,
    handler: "str | None" = None,
    with_payload: bool = True,
) -> DataFrame:
    """One row per sample (frame / audio packet): timing, size, and —
    when `with_payload` — the raw bytes sliced out of mdat.  `handler`
    filters tracks ('vide'/'soun').  Samples whose byte range exceeds
    the blob (truncated mdat) are skipped; the rest of the track
    survives.  Codec decode of the payloads is deliberately NOT here —
    see the module docstring."""

    def kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(blob) if blob is not None else b""
                try:
                    info = parse_mp4(raw)
                except Mp4Error:
                    continue
                for tr in info["tracks"]:
                    if handler and tr.get("handler") != handler:
                        continue
                    ts = tr.get("timescale")
                    for s in mp4_samples(tr):
                        if s["offset"] + s["size"] > len(raw):
                            continue  # truncated mdat: skip lost samples
                        rows.append(
                            {
                                "media_id": mid,
                                "track_id": tr.get("track_id"),
                                "sample_idx": s["idx"],
                                "dts_ms": _dur_ms(s["dts"], ts),
                                "duration_ms": _dur_ms(s["duration"], ts),
                                "size_bytes": s["size"],
                                "payload": raw[
                                    s["offset"] : s["offset"] + s["size"]
                                ]
                                if with_payload
                                else None,
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in MP4_SAMPLE_SCHEMA.fields],
            )

    return media.select("media_id", "content").mapInPandas(
        kernel, MP4_SAMPLE_SCHEMA
    )
