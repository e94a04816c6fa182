"""MPEG audio (MP3) frame walk on stdlib bytes alone.

The MP4 discipline applied to MPEG audio elementary streams: the
CONTAINER layer — frame sync, header fields, frame sizes, timing, and
the Layer III SIDE INFORMATION block (`parse_side_info`: bit-reservoir
pointer, Huffman partition geometry, gains, block-switching flags) — is
real, distributed work (slicing a stream into frames is what lets audio
shards route, dedupe, and sample without an audio library), while the
SPECTRAL layer (Huffman spectral decode over ISO table B.7,
requantization, IMDCT/synthesis windows) stays honestly gated behind
NotImplementedError in pipeline/multimodal.py: those stages are driven
by large published constant tables that cannot be transcription-
verified in this runtime (no reference codec exists here, and an
encoder/decoder roundtrip cannot catch a mis-copied table — symmetric
errors cancel), and a wrong-constant decoder would silently corrupt
features where the explicit gate fails loudly.

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
    protection = (h >> 16) & 0x1  # 0 = 16-bit CRC follows the header
    mode = (h >> 6) & 0x3  # 3 = single_channel
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
        "channels": 1 if mode == 3 else 2,
        "crc": protection == 0,
    }


class _Bits:
    """MSB-first bit reader over a byte slice (the side-info bit layout
    is a packed big-endian field sequence)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def take(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise Mp3Error("side info truncated")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


def _granule_fields(bits: "_Bits", lsf: bool) -> dict:
    g: dict = {
        "part2_3_length": bits.take(12),
        "big_values": bits.take(9),
        "global_gain": bits.take(8),
        "scalefac_compress": bits.take(9 if lsf else 4),
        "window_switching": bits.take(1),
    }
    if g["window_switching"]:
        g["block_type"] = bits.take(2)
        g["mixed_block"] = bits.take(1)
        g["table_select"] = [bits.take(5) for _ in range(2)]
        g["subblock_gain"] = [bits.take(3) for _ in range(3)]
        # region counts are IMPLICIT for switched blocks (fixed spec
        # defaults that only the spectral requantizer consumes — the
        # layer that is honestly gated here); None marks "not coded in
        # the bitstream" without fabricating constants this runtime
        # cannot transcription-verify
        g["region0_count"] = None
        g["region1_count"] = None
    else:
        g["block_type"] = 0
        g["mixed_block"] = 0
        g["table_select"] = [bits.take(5) for _ in range(3)]
        g["subblock_gain"] = [0, 0, 0]
        g["region0_count"] = bits.take(4)
        g["region1_count"] = bits.take(3)
    if not lsf:
        g["preflag"] = bits.take(1)
    else:
        g["preflag"] = 0  # LSF has no preflag bit (implied by sf table)
    g["scalefac_scale"] = bits.take(1)
    g["count1table_select"] = bits.take(1)
    return g


def side_info_size(version: str, channels: int) -> int:
    """Layer III side-info byte length: MPEG1 17 (mono) / 32 (stereo);
    MPEG2/2.5 LSF 9 / 17.  These totals are exactly the sum of the
    parsed field widths — `parse_side_info` consumes precisely this
    many bytes, which tests assert as a structural checksum."""
    if version == "MPEG1":
        return 17 if channels == 1 else 32
    return 9 if channels == 1 else 17


def parse_side_info(data: bytes, frame_pos: int) -> dict:
    """Decode the Layer III SIDE INFORMATION block of the frame starting
    at `frame_pos` (ISO 11172-3 2.4.1.7 / 13818-3 LSF layout) — the
    structural half of the spectral payload: where the main data begins
    (bit reservoir back-pointer), and per granule/channel the Huffman
    partition geometry (big_values, region counts, table selects),
    gain/scalefactor parameters, and block-switching flags.

    This is real, verifiable structure (the field widths sum to the
    spec's fixed side-info byte lengths — see `side_info_size`), parsed
    from stdlib bytes alone.  The remaining honest gate in this runtime
    is the SPECTRAL decode downstream of these fields: Huffman spectral
    tables (ISO table B.7), requantization + IMDCT/synthesis windows —
    large published constant tables that cannot be transcription-
    verified here without a reference codec, and a wrong-constant
    decoder would be worse than the explicit NotImplementedError
    (pipeline/multimodal.py's codec-gate convention).

    Returns {'main_data_begin', 'private_bits', 'scfsi' (per channel),
    'granules': [[granule dict per channel] per granule]}.  Raises
    Mp3Error on a non-Layer-III frame or truncation."""
    hdr = parse_frame_header(data, frame_pos)
    if hdr is None:
        raise Mp3Error(f"no frame header at {frame_pos}")
    if hdr["layer"] != "III":
        raise Mp3Error(f"side info is Layer III only, got {hdr['layer']}")
    lsf = hdr["version"] != "MPEG1"
    ch = hdr["channels"]
    start = frame_pos + 4 + (2 if hdr["crc"] else 0)
    size = side_info_size(hdr["version"], ch)
    blob = data[start : start + size]
    if len(blob) < size:
        raise Mp3Error("side info truncated")
    bits = _Bits(blob)
    out: dict = {
        "main_data_begin": bits.take(8 if lsf else 9),
        "private_bits": bits.take(
            (1 if ch == 1 else 2) if lsf else (5 if ch == 1 else 3)
        ),
    }
    if lsf:
        out["scfsi"] = [[0, 0, 0, 0] for _ in range(ch)]
        n_gr = 1
    else:
        out["scfsi"] = [
            [bits.take(1) for _ in range(4)] for _ in range(ch)
        ]
        n_gr = 2
    out["granules"] = [
        [_granule_fields(bits, lsf) for _ in range(ch)]
        for _ in range(n_gr)
    ]
    # structural checksum: the fields must consume the whole block
    if bits.pos != size * 8:
        raise Mp3Error(
            f"side info layout error: consumed {bits.pos} of {size * 8} bits"
        )
    return out


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
    side_info: bool = False,
) -> bytes:
    """Minimal valid MPEG1 Layer III stream for fixtures (the build_mp4
    discipline): `n_frames` constant-bitrate frames with deterministic
    filler payloads, optionally preceded by an empty ID3v2 tag.

    With ``side_info=True`` each frame sets protection_bit=1 (no CRC)
    and leads its payload with a zeroed 17-byte mono side-info block —
    the structure of a silent frame (main_data_begin=0, big_values=0,
    all gains 0), which `parse_side_info` decodes; the default keeps
    byte-identical output for all existing fixtures."""
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
            | ((1 if side_info else 0) << 16)  # protection: 1 = no CRC
            | (bidx << 12)
            | (rate_idx << 10)
            | (0 << 9)  # no padding
            | (3 << 6)  # mono
        )
        frame = bytearray(struct.pack(">I", h))
        if side_info:
            frame += bytes(17)  # silent-frame side info, all fields 0
            frame += bytes([(payload_byte + i) % 256] * (size - 4 - 17))
        else:
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
