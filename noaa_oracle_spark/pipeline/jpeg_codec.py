"""Baseline JPEG codec on stdlib+numpy (the last compressed-image gate).

Pure-spec implementation (ITU-T T.81): marker parse, DQT/DHT/SOF0/SOF2/
SOS/DRI, Huffman-coded MCU entropy decode with byte stuffing and restart
markers, dequantize, zigzag, 2-D IDCT as two matrix products against the
orthonormal DCT-II basis, sampling-factor upsample, JFIF YCbCr→RGB.
Supported: baseline sequential (SOF0) AND progressive (SOF2 — spectral
selection + successive approximation, Annex G: DC/AC first and refinement
scans, EOB runs, per-scan coefficient accumulation reconstructed at EOI),
8-bit, 1 or 3 components, any h×v sampling factors (4:4:4 / 4:2:2 /
4:2:0 …). Arithmetic coding, 12-bit and hierarchical modes raise
ValueError — corrupt corpora must degrade to NULL columns, not kill tasks
(same contract as media_codecs).

The encoders exist to make REAL test fixtures without an imaging library:
baseline 4:4:4/4:2:0 plus a progressive encoder (cjpeg's standard
10-scan script), quality-scaled Annex-K quantization tables, the spec's
Annex-K typical Huffman tables. Both encoders quantize identically, so a
progressive decode must equal the baseline decode of the same image
BIT-FOR-BIT — the strongest oracle the tests pin. Decode(encode(x)) is
lossy-close, not equal, so tests additionally anchor exactness on
hand-constructed streams (a solid-color block is a DC-only coefficient
whose reconstruction is exact) and bound the round-trip error on smooth
images.

The per-MCU Python loop is driver/executor-side per-BLOB work inside
mapInPandas — the same batch shape as every other codec here; a 100 TB
corpus decodes blobs map-side, never through a shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order
# via zigzag application at use sites; stored here in zigzag order as the
# spec lists them)
QUANT_LUMA = np.array(
    [
        16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
        26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
        56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
        95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
        103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis C (rows = frequencies): spatial =
    C.T @ coef @ C; coef = C @ spatial @ C.T."""
    k = np.arange(8)
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_basis()


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------


def _build_huffman(bits: "list[int]", vals: "list[int]") -> dict:
    """(code_length, code) → symbol, per T.81 C.2 canonical assignment."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _build_encode_table(bits: "list[int]", vals: "list[int]") -> dict:
    """symbol → (code, length), inverse of _build_huffman."""
    out = {}
    for (length, code), sym in _build_huffman(bits, vals).items():
        out[sym] = (code, length)
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 stuffing;
    stops at any non-RST marker (caller handles RST alignment)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt - 0xD0)
            else:
                raise ValueError("unexpected marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def byte_align(self) -> None:
        self.nbits = 0

    def skip_restart(self) -> None:
        """Consume an RSTn marker at the current byte position."""
        self.byte_align()
        d = self.data
        # an all-ones padding byte is 0xFF and rides with its stuffed 0x00;
        # it belongs to the previous MCU's tail and precedes the marker
        while d[self.pos] == 0xFF and d[self.pos + 1] == 0x00:
            self.pos += 2
        if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, n: int):
        self.n = n


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, 3) uint8 RGB."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error, KeyError, _RestartMarker) as exc:
        # Every way a corrupt stream surfaces — running off the end
        # (IndexError/struct.error), a scan referencing a DHT/DQT table
        # that was never defined (KeyError), an unexpected RST marker
        # inside entropy data (_RestartMarker) — converts to ValueError:
        # the operator contract is ValueError → NULL column, never a
        # task kill.
        raise ValueError(f"truncated/corrupt JPEG: {exc!r}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coefs = None  # progressive: per-component coefficient accumulators
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[p : p + 64], np.uint8
                    ).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p : p + 128], ">u2"
                    ).astype(np.int64)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                tbl = _build_huffman(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + i * 3)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) JPEG "
                "supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            order = []
            for i in range(ns):
                cs, tables = struct.unpack_from(">BB", seg, 1 + i * 2)
                scan[cs] = (tables >> 4, tables & 0x0F)
                order.append(cs)
            if not frame["progressive"]:
                return _decode_scan(
                    data, pos + seglen, frame, scan, qt, huff_dc,
                    huff_ac, restart_interval,
                )
            ss, se, ahal = struct.unpack_from(
                ">BBB", seg, 1 + ns * 2
            )
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_progressive_scan(
                data, pos + seglen, frame, order, scan, huff_dc,
                huff_ac, restart_interval, coefs,
                ss, se, ahal >> 4, ahal & 0x0F,
            )
            continue
        pos += seglen
    if frame is not None and frame["progressive"] and coefs is not None:
        return _reconstruct_progressive(frame, coefs, qt)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, ri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        cw, ch = mcux * c["h"] * 8, mcuy * c["v"] * 8
        planes.append(np.zeros((ch, cw), np.float64))
        if c["tq"] not in qt:
            raise ValueError("missing quantization table")
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_count and mcu_count % ri == 0:
                br.skip_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(
                            br, huff_dc[dc_t], huff_ac[ac_t],
                            qt[c["tq"]], pred, ci,
                        )
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    return _finish_planes(planes, frame)


def _finish_planes(planes, frame):
    """Upsample to full geometry, crop, level-shift, color-convert —
    shared tail of the baseline and progressive paths."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        out.append(p[:h, :w])
    if len(out) == 1:
        # round-then-cast, same as the RGB path below — a bare uint8 cast
        # truncates and sits ~0.5 below the spec's rounded reconstruction
        y = np.clip(np.round(out[0] + 128.0), 0, 255)
        g = y.astype(np.uint8)
        return np.repeat(g[..., None], 3, 2)
    y, cb, cr = out[0] + 128.0, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(br, dc_tbl, ac_tbl, q, pred, ci):
    coef = np.zeros(64, np.int64)
    t = br.decode_symbol(dc_tbl)
    diff = _extend(br.read_bits(t), t) if t else 0
    pred[ci] += diff
    coef[0] = pred[ci]
    k = 1
    while k < 64:
        rs = br.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(br.read_bits(s), s)
        k += 1
    dq = (coef * q).astype(np.float64)
    blk = np.zeros((8, 8), np.float64)
    blk.flat[ZIGZAG] = dq  # de-zigzag into natural order
    return _C.T @ blk @ _C  # 2-D IDCT (level shift applied later)


# ---------------------------------------------------------------------------
# progressive decode (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------


def _comp_geometry(frame, c):
    """((nbx, nby) actual block grid, (pbx, pby) MCU-padded grid)."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return (-(-cw // 8), -(-ch // 8)), (mcux * c["h"], mcuy * c["v"])


def _alloc_coefs(frame):
    """Per-component zigzag-order coefficient accumulators at the
    MCU-padded grid (DC scans may be interleaved and touch the padding
    blocks; AC scans cover only the actual grid)."""
    out = []
    for c in frame["comps"]:
        _, (pbx, pby) = _comp_geometry(frame, c)
        out.append(np.zeros((pby, pbx, 64), np.int32))
    return out


def _decode_progressive_scan(
    data, pos, frame, order, scan, huff_dc, huff_ac, ri, coefs,
    ss, se, ah, al,
):
    """One SOS of a progressive stream (T.81 G.2): updates `coefs` in
    place, returns the byte position of the marker that ends the scan.

    Four scan kinds, dispatched on (ss, ah):
      ss == 0, ah == 0 — DC first (baseline DC decode, values << al);
      ss == 0, ah > 0  — DC refinement (one appended bit per block);
      ss > 0,  ah == 0 — AC first (EOB-run coded, values << al);
      ss > 0,  ah > 0  — AC refinement (G.1.2.3 correction bits).
    DC scans may interleave several components (MCU order over the
    padded grid); AC scans are single-component, block-raster over the
    component's ACTUAL grid. Restart markers reset predictors and the
    EOB run every `ri` units."""
    comps = frame["comps"]
    members = [
        (ci, c) for ci, c in enumerate(comps) if c["id"] in scan
    ]
    if [c["id"] for _, c in members] != order:
        members.sort(key=lambda t: order.index(t[1]["id"]))
    br = _BitReader(data, pos)
    state = {"eobrun": 0}

    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with nonzero Se")
        pred = [0] * len(comps)
        interleaved = len(members) > 1

        def dc_block(ci, c, by, bx):
            coef = coefs[ci][by, bx]
            if ah == 0:
                t = br.decode_symbol(huff_dc[scan[c["id"]][0]])
                diff = _extend(br.read_bits(t), t) if t else 0
                pred[ci] += diff
                coef[0] = pred[ci] << al
            else:
                if br.read_bit():
                    coef[0] |= 1 << al

        if interleaved:
            hmax = max(x["h"] for x in comps)
            vmax = max(x["v"] for x in comps)
            mcux = -(-frame["w"] // (8 * hmax))
            mcuy = -(-frame["h"] // (8 * vmax))
            n = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and n and n % ri == 0:
                        br.skip_restart()
                        pred = [0] * len(comps)
                    for ci, c in members:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(
                                    ci, c,
                                    my * c["v"] + by, mx * c["h"] + bx,
                                )
                    n += 1
        else:
            ci, c = members[0]
            (nbx, nby), _ = _comp_geometry(frame, c)
            n = 0
            for by in range(nby):
                for bx in range(nbx):
                    if ri and n and n % ri == 0:
                        br.skip_restart()
                        pred = [0] * len(comps)
                    dc_block(ci, c, by, bx)
                    n += 1
    else:
        if len(members) != 1:
            raise ValueError("AC progressive scan must be one component")
        ci, c = members[0]
        ac_tbl = huff_ac[scan[c["id"]][1]]
        (nbx, nby), _ = _comp_geometry(frame, c)
        n = 0
        for by in range(nby):
            for bx in range(nbx):
                if ri and n and n % ri == 0:
                    br.skip_restart()
                    state["eobrun"] = 0
                coef = coefs[ci][by, bx]
                if ah == 0:
                    _ac_first(br, ac_tbl, coef, ss, se, al, state)
                else:
                    _ac_refine(br, ac_tbl, coef, ss, se, al, state)
                n += 1

    # the scan's entropy data ends at the next real marker
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return len(data)


def _ac_first(br, tbl, coef, ss, se, al, state):
    """AC spectral-selection first scan for one block (T.81 G.1.2.2)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = br.decode_symbol(tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eob = 1 << r
            if r:
                eob += br.read_bits(r)
            state["eobrun"] = eob - 1  # current block counts
            break
        k += r
        if k > se:
            raise ValueError("AC run past spectral band")
        coef[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _ac_refine(br, tbl, coef, ss, se, al, state):
    """AC successive-approximation refinement for one block
    (T.81 G.1.2.3): newly-nonzero coefficients arrive with magnitude
    1 << al; every already-nonzero coefficient visited receives one
    correction bit."""
    p1 = 1 << al
    m1 = -p1

    def correct(k):
        if br.read_bit() and (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = br.decode_symbol(tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eob = 1 << r
                    if r:
                        eob += br.read_bits(r)
                    state["eobrun"] = eob
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement magnitude")
                val = p1 if br.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def _reconstruct_progressive(frame, coefs, qt):
    """Dequantize + IDCT every accumulated block, then the shared
    upsample/color tail."""
    planes = []
    for ci, c in enumerate(frame["comps"]):
        if c["tq"] not in qt:
            raise ValueError("missing quantization table")
        q = qt[c["tq"]]
        _, (pbx, pby) = _comp_geometry(frame, c)
        plane = np.zeros((pby * 8, pbx * 8), np.float64)
        arr = coefs[ci]
        for by in range(pby):
            for bx in range(pbx):
                dq = (arr[by, bx].astype(np.int64) * q).astype(np.float64)
                blk = np.zeros((8, 8), np.float64)
                blk.flat[ZIGZAG] = dq
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ blk @ _C
                )
        planes.append(plane)
    return _finish_planes(planes, frame)


# ---------------------------------------------------------------------------
# encoder (test-fixture generator; baseline, 4:4:4)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (category, magnitude bits) per F.12 inverse."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex-K table."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _pad_to(plane: np.ndarray, hh: int, ww: int) -> np.ndarray:
    """Edge-replicate a plane up to (hh, ww)."""
    out = np.empty((hh, ww), np.float64)
    h, w = plane.shape
    out[:h, :w] = plane
    if h < hh:
        out[h:, :w] = plane[h - 1, :]
    if w < ww:
        out[:, w:] = out[:, w - 1 : w]
    return out


#: cjpeg's standard progressive scan script (4:4:4, 3 components):
#: (component indices, Ss, Se, Ah, Al)
PROGRESSIVE_SCRIPT = [
    ([0, 1, 2], 0, 0, 0, 1),   # DC first, approximated
    ([0], 1, 5, 0, 2),         # Y low AC band
    ([2], 1, 63, 0, 1),        # Cr full band
    ([1], 1, 63, 0, 1),        # Cb full band
    ([0], 6, 63, 0, 2),        # Y high AC band
    ([0, 1, 2], 0, 0, 1, 0),   # DC refinement
    ([0], 1, 63, 2, 1),        # Y AC refine 2→1
    ([2], 1, 63, 1, 0),        # Cr AC refine 1→0
    ([1], 1, 63, 1, 0),        # Cb AC refine 1→0
    ([0], 1, 63, 1, 0),        # Y AC refine 1→0
]


def _pt(v: int, al: int) -> int:
    """AC point transform: divide by 2^al truncating toward zero (the
    DC point transform is an arithmetic shift — applied at call sites)."""
    return -((-v) >> al) if v < 0 else v >> al


def _encode_ac_first(bw, ac_tbl, zz, ss, se, al) -> None:
    """AC spectral-selection first scan for one block; EOB runs capped
    at one block (symbol 0x00) because the Annex-K tables define no
    EOBn (r>0) symbols — spec-legal, just less compressed."""
    run = 0
    for k in range(ss, se + 1):
        v = _pt(int(zz[k]), al)
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]
            bw.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
    if run:
        code, ln = ac_tbl[0x00]
        bw.write(code, ln)


def _encode_ac_refine(bw, ac_tbl, zz, ss, se, al) -> None:
    """AC successive-approximation refinement for one block (inverse of
    _ac_refine; Ah = al + 1). History-nonzero coefficients contribute
    one correction bit each, buffered and flushed after the next coded
    symbol; newly-nonzero ones code as (r<<4)|1 + sign. Per-block EOB
    (0x00) instead of cross-block runs, same Annex-K constraint as
    _encode_ac_first."""
    absv = [abs(_pt(int(zz[k]), al)) for k in range(ss, se + 1)]
    eob_rel = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob_rel = i
    pending: list[int] = []
    run = 0
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob_rel:
            code, ln = ac_tbl[0xF0]
            bw.write(code, ln)
            run -= 16
            for bit in pending:
                bw.write(bit, 1)
            pending = []
        if t > 1:
            pending.append(t & 1)
            continue
        code, ln = ac_tbl[(run << 4) | 1]
        bw.write(code, ln)
        bw.write(0 if int(zz[ss + i]) < 0 else 1, 1)
        run = 0
        for bit in pending:
            bw.write(bit, 1)
        pending = []
    if run or pending:
        code, ln = ac_tbl[0x00]  # EOB (run of exactly one block)
        bw.write(code, ln)
        for bit in pending:
            bw.write(bit, 1)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    scans: "list | None" = None,
) -> bytes:
    """(H, W, 3) uint8 RGB → progressive (SOF2) JFIF bytes, 4:4:4,
    Annex-K tables, cjpeg's standard scan script by default. Quantized
    coefficients are IDENTICAL to encode_jpeg's at the same quality, so
    progressive and baseline decodes of the same image must agree
    bit-for-bit — the property the decoder tests pin."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H, W, 3)")
    h, w = img.shape[:2]
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    mcuy, mcux = -(-h // 8), -(-w // 8)
    planes = [
        _pad_to(p, mcuy * 8, mcux * 8) for p in (y, cb, cr)
    ]
    quants = [ql, qc, qc]
    # quantized zigzag coefficients per component, (by, bx, 64)
    zzs = []
    for p, q in zip(planes, quants):
        arr = np.zeros((mcuy, mcux, 64), np.int64)
        for by in range(mcuy):
            for bx in range(mcux):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _C @ blk @ _C.T
                arr[by, bx] = np.round(coef.flat[ZIGZAG] / q).astype(
                    np.int64
                )
        zzs.append(arr)

    dc_enc = [
        _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_enc = [
        _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    body = bytearray()
    for comp_idx, ss, se, ah, al in (scans or PROGRESSIVE_SCRIPT):
        ns = len(comp_idx)
        hdr = bytes([ns])
        for ci in comp_idx:
            tbl_sel = (0 if ci == 0 else 1)
            hdr += bytes([ci + 1, (tbl_sel << 4) | tbl_sel])
        hdr += bytes([ss, se, (ah << 4) | al])
        body += seg(0xDA, hdr)
        bw = _BitWriter()
        if ss == 0:
            pred = [0, 0, 0]
            for by in range(mcuy):
                for bx in range(mcux):
                    for ci in comp_idx:
                        c0 = int(zzs[ci][by, bx, 0])
                        if ah == 0:
                            v = c0 >> al  # DC point transform
                            diff = v - pred[ci]
                            pred[ci] = v
                            t, bits = _magnitude(diff)
                            code, ln = dc_enc[0 if ci == 0 else 1][t]
                            bw.write(code, ln)
                            if t:
                                bw.write(bits, t)
                        else:
                            bw.write((c0 >> al) & 1, 1)
        else:
            if ns != 1:
                raise ValueError("AC scan must be single-component")
            ci = comp_idx[0]
            tbl = ac_enc[0 if ci == 0 else 1]
            for by in range(mcuy):
                for bx in range(mcux):
                    zz = zzs[ci][by, bx]
                    if ah == 0:
                        _encode_ac_first(bw, tbl, zz, ss, se, al)
                    else:
                        _encode_ac_refine(bw, tbl, zz, ss, se, al)
        bw.flush()
        body += bytes(bw.out)

    sof = seg(
        0xC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(int(x) for x in ql))
        + seg(0xDB, bytes([1]) + bytes(int(x) for x in qc))
        + seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
        + seg(0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
        + seg(0xC4, bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
        + sof
        + bytes(body)
        + b"\xff\xd9"
    )


def _encode_block(bw, blk, q, pred, ci, dc_tbl, ac_tbl) -> None:
    coef = _C @ blk @ _C.T
    zz = np.round(coef.flat[ZIGZAG] / q).astype(np.int64)
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t, bits = _magnitude(diff)
    code, ln = dc_tbl[t]
    bw.write(code, ln)
    if t:
        bw.write(bits, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
    if run:
        code, ln = ac_tbl[0x00]  # EOB
        bw.write(code, ln)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes (Annex-K tables).

    subsample=True emits 4:2:0 (2×2 luma blocks per MCU, chroma mean-
    pooled 2×2) — the dominant web-JPEG layout; restart_interval > 0
    emits DRI + RSTn markers every N MCUs with predictor resets. Both
    exist to exercise the decoder's full marker/MCU geometry."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H, W, 3)")
    h, w = img.shape[:2]
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b

    if subsample:
        hy = vy = 2
        # mean-pool chroma 2×2 (pad odd dims first)
        cb = _pad_to(cb, h + h % 2, w + w % 2)
        cr = _pad_to(cr, h + h % 2, w + w % 2)
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
    else:
        hy = vy = 1
    mcu_h, mcu_w = vy * 8, hy * 8
    mcuy, mcux = -(-h // mcu_h), -(-w // mcu_w)
    yp = _pad_to(y, mcuy * mcu_h, mcux * mcu_w)
    cbp = _pad_to(cb, mcuy * 8, mcux * 8)
    crp = _pad_to(cr, mcuy * 8, mcux * 8)

    dc_enc = [
        _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_enc = [
        _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            for by in range(vy):
                for bx in range(hy):
                    y0, x0 = my * mcu_h + by * 8, mx * mcu_w + bx * 8
                    _encode_block(
                        bw, yp[y0 : y0 + 8, x0 : x0 + 8], ql, pred, 0,
                        dc_enc[0], ac_enc[0],
                    )
            y0, x0 = my * 8, mx * 8
            _encode_block(
                bw, cbp[y0 : y0 + 8, x0 : x0 + 8], qc, pred, 1,
                dc_enc[1], ac_enc[1],
            )
            _encode_block(
                bw, crp[y0 : y0 + 8, x0 : x0 + 8], qc, pred, 2,
                dc_enc[1], ac_enc[1],
            )
            mcu_count += 1
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(int(x) for x in tbl))

    def dht(tc: int, th: int, bits, vals) -> bytes:
        return seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )

    samp = (hy << 4) | vy
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"
        + dqt(0, ql)
        + dqt(1, qc)
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + dri
        + sof
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )
