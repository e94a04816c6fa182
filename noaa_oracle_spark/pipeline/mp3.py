"""MPEG audio (MP3) frame walk on stdlib bytes alone.

The MP4 discipline applied to MPEG audio elementary streams: the
CONTAINER layer — frame sync, header fields, frame sizes, timing — is
real, distributed work (slicing a stream into frames is what lets audio
shards route, dedupe, and sample without an audio library), while the
codec layer (Huffman spectral decode, IMDCT) stays honestly gated behind
NotImplementedError in pipeline/multimodal.py.

Header math (ISO 11172-3 / 13818-3): a frame starts at an 11-bit sync;
version (MPEG1/2/2.5), layer (I/II/III), bitrate index, sample-rate
index, and padding determine the frame byte length and its sample count:

    Layer I:             size = (12·bitrate/rate + pad)·4, 384 samples
    Layer II:            size = 144·bitrate/rate + pad,   1152 samples
    Layer III MPEG1:     size = 144·bitrate/rate + pad,   1152 samples
    Layer III MPEG2/2.5: size = 72·bitrate/rate + pad,     576 samples

ID3v2 tags are skipped by their syncsafe length; ID3v1 ("TAG", 128
bytes) ends the walk.  A malformed header ends the walk at the frames
parsed so far (the truncation convention every media reader here
follows) — no resync heuristics, which keeps the walk deterministic and
SQL-restateable for the gate.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# bitrate table [kbps], indexed [version_group][layer][bitrate_index];
# version_group 0 = MPEG1, 1 = MPEG2/2.5; layer index 0 = I, 1 = II, 2 = III
_BITRATES = {
    (0, 0): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (0, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (0, 2): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (1, 0): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (1, 1): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (1, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
# sample rates [Hz] by version: MPEG1, MPEG2, MPEG2.5
_RATES = {
    3: [44100, 48000, 32000],  # version bits 11 = MPEG1
    2: [22050, 24000, 16000],  # 10 = MPEG2
    0: [11025, 12000, 8000],  # 00 = MPEG2.5
}


class Mp3Error(ValueError):
    pass


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none).

    The synchsafe size excludes BOTH the 10-byte header and, when the
    ID3v2.4 footer flag (byte 5, bit 0x10) is set, the 10-byte '3DI'
    footer — a footered tag skipped 10 short would land the sync scan
    on the footer bytes and drop a perfectly decodable stream."""
    if len(data) >= 10 and data[:3] == b"ID3":
        ss = data[6:10]
        if all(b < 0x80 for b in ss):
            size = 10 + (
                (ss[0] << 21) | (ss[1] << 14) | (ss[2] << 7) | ss[3]
            )
            if data[5] & 0x10:
                size += 10  # ID3v2.4 footer present
            return size
    return 0


def parse_frame_header(data: bytes, pos: int) -> dict | None:
    """Decode the 4-byte header at `pos`; None if it is not a valid
    frame header (bad sync / reserved field values)."""
    if pos + 4 > len(data):
        return None
    h = struct.unpack_from(">I", data, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer_bits = (h >> 17) & 0x3  # 3=I, 2=II, 1=III, 0=reserved
    bitrate_idx = (h >> 12) & 0xF
    rate_idx = (h >> 10) & 0x3
    padding = (h >> 9) & 0x1
    if version == 1 or layer_bits == 0:
        return None
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None  # free-format and reserved: out of scope
    layer = 3 - layer_bits  # 0=I, 1=II, 2=III
    vgroup = 0 if version == 3 else 1
    bitrate = _BITRATES[(vgroup, layer)][bitrate_idx] * 1000
    rate = _RATES[version][rate_idx]
    if layer == 0:
        size = (12 * bitrate // rate + padding) * 4
        samples = 384
    elif layer == 1 or vgroup == 0:
        size = 144 * bitrate // rate + padding
        samples = 1152
    else:
        size = 72 * bitrate // rate + padding
        samples = 576
    return {
        "version": {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[version],
        "layer": ("I", "II", "III")[layer],
        "bitrate": bitrate,
        "sample_rate": rate,
        "padding": padding,
        "size": size,
        "samples": samples,
    }


def parse_mp3(data: bytes) -> dict:
    """Walk the stream: {'frames': [{offset, size, bitrate, sample_rate,
    samples}...], 'duration_ms', 'sample_rate', 'avg_bitrate'}.  Raises
    Mp3Error when no valid first frame exists; a malformed header later
    ends the walk at the parsed prefix."""
    pos = _id3v2_size(data)
    frames: list[dict] = []
    dur_us = 0
    rate = None
    while pos + 4 <= len(data):
        if data[pos : pos + 3] == b"TAG":  # ID3v1 trailer
            break
        hdr = parse_frame_header(data, pos)
        if hdr is None or pos + hdr["size"] > len(data):
            break
        frames.append(
            {
                "offset": pos,
                "size": hdr["size"],
                "bitrate": hdr["bitrate"],
                "sample_rate": hdr["sample_rate"],
                "samples": hdr["samples"],
            }
        )
        # accumulate duration per frame: a stream may legally switch
        # sample rates mid-way (e.g. MPEG1/MPEG2 transition), so the
        # grand total of samples over the LAST frame's rate would be
        # wrong; integer microseconds avoid float drift
        dur_us += hdr["samples"] * 1_000_000 // hdr["sample_rate"]
        rate = hdr["sample_rate"]
        pos += hdr["size"]
    if not frames:
        raise Mp3Error("no valid MPEG audio frame")
    dur_ms = dur_us // 1000
    avg = sum(f["bitrate"] for f in frames) // len(frames)
    return {
        "frames": frames,
        "duration_ms": dur_ms,
        "sample_rate": rate,
        "avg_bitrate": avg,
    }


def build_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    payload_byte: int = 0x00,
    id3v2_bytes: int = 0,
) -> bytes:
    """Minimal valid MPEG1 Layer III stream for fixtures (the build_mp4
    discipline): `n_frames` constant-bitrate frames with deterministic
    filler payloads, optionally preceded by an empty ID3v2 tag."""
    rate_idx = _RATES[3].index(sample_rate)
    bidx = _BITRATES[(0, 2)].index(bitrate_kbps)
    out = bytearray()
    if id3v2_bytes:
        body = id3v2_bytes
        out += b"ID3" + bytes([4, 0, 0]) + bytes(
            [(body >> 21) & 0x7F, (body >> 14) & 0x7F,
             (body >> 7) & 0x7F, body & 0x7F]
        ) + bytes(body)
    size = 144 * bitrate_kbps * 1000 // sample_rate
    for i in range(n_frames):
        h = (
            (0x7FF << 21)
            | (3 << 19)  # MPEG1
            | (1 << 17)  # Layer III
            | (bidx << 12)
            | (rate_idx << 10)
            | (0 << 9)  # no padding
            | (3 << 6)  # mono
        )
        frame = bytearray(struct.pack(">I", h))
        frame += bytes([(payload_byte + i) % 256] * (size - 4))
        out += frame
    return bytes(out)


MP3_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("bitrate", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
    ]
)

MP3_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("avg_bitrate", T.IntegerType(), False),
    ]
)


def mp3_frame_manifest(media: DataFrame) -> DataFrame:
    """One row per MPEG audio frame: position, size, header fields —
    map-side over blobs (mapInPandas), zero Exchange, non-MP3 blobs
    yield zero rows (the media convention)."""

    def kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    info = parse_mp3(bytes(blob) if blob is not None else b"")
                except Mp3Error:
                    continue
                for i, fr in enumerate(info["frames"]):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "offset": fr["offset"],
                            "size_bytes": fr["size"],
                            "bitrate": fr["bitrate"],
                            "sample_rate": fr["sample_rate"],
                            "n_samples": fr["samples"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MP3_FRAME_SCHEMA.fields]
            )

    return media.select("media_id", "content").mapInPandas(
        kernel, MP3_FRAME_SCHEMA
    )


def mp3_metadata(media: DataFrame) -> DataFrame:
    """Stream-level metadata per blob (duration, rate, mean bitrate)."""

    def kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    info = parse_mp3(bytes(blob) if blob is not None else b"")
                except Mp3Error:
                    continue
                rows.append(
                    {
                        "media_id": mid,
                        "n_frames": len(info["frames"]),
                        "duration_ms": info["duration_ms"],
                        "sample_rate": info["sample_rate"],
                        "avg_bitrate": info["avg_bitrate"],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MP3_META_SCHEMA.fields]
            )

    return media.select("media_id", "content").mapInPandas(
        kernel, MP3_META_SCHEMA
    )
