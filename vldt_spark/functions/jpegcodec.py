"""Zero-dependency baseline JPEG codec (ITU-T T.81 baseline sequential).

The container has no image libraries, but baseline JPEG needs only
numpy + stdlib: the encoder here produces real interchange-format JFIF
bytes (standard Annex K quantization + Huffman tables, 4:4:4, no
subsampling, no restart markers) and the decoder reads real baseline
streams (any 8-bit-precision SOF0 with 1x1 sampling, multiple DQT/DHT
segments, APPn/COM skipping, RST-marker tolerance).

This is the deterministic-fixture path that makes the JPEG pixel
surface VALUE-CHECKABLE with no codec library: constant-color blocks
have a DC-only DCT, so for even gray values the quantize → dequantize →
IDCT round trip is bit-exact and an SQL oracle predicts the decoded
pixel sums closed-form (see synthesize_jpeg_pixel_payloads /
jpeg_pixel_stats_documents).  Non-constant content round-trips within
normal quantization error, asserted in pytest.

Production note (100 TB): entropy decode is sequential per image by
nature; the parallelism is across images via mapInPandas — same batch
shape as the PNG path in multimodal.py.  Per-image Python-loop Huffman
decode is the honest cost of zero deps; swap `decode_jpeg_pixels` for a
libjpeg-turbo binding when the cluster image ships one (the Spark-side
plumbing is identical).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K — public specification constants)
# ---------------------------------------------------------------------------

STD_LUMA_QT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

STD_CHROMA_QT = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# zigzag scan order: ZIGZAG[k] = flat row-major index of the k-th coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# standard Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II basis: block = A.T @ coeffs @ A, coeffs = A @ block @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits: list[int], vals: list[int]):
    """symbol -> (code, length) per the canonical JPEG assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]):
    """(code, length) -> symbol for the decoder."""
    enc = _canonical_codes(bits, vals)
    return {(c, l): s for s, (c, l) in enc.items()}


def scale_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling; quality=50 returns the Annex K table as-is
    (the bit-exact fixture path relies on that)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base.astype(np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(
    writer: _BitWriter, qcoef: np.ndarray, pred_dc: int, dc_codes, ac_codes
) -> int:
    zz = qcoef.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred_dc
    size = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        amp = diff if diff >= 0 else diff + (1 << size) - 1
        writer.write(amp, size)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            writer.write(c, l)
            run -= 16
        s = _magnitude(v)
        c, l = ac_codes[(run << 4) | s]
        writer.write(c, l)
        amp = v if v >= 0 else v + (1 << s) - 1
        writer.write(amp, s)
        run = 0
    if last_nz < 63:
        c, l = ac_codes[0x00]  # EOB
        writer.write(c, l)
    return dc


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(p: np.ndarray) -> np.ndarray:
    y, cb, cr = p[..., 0], p[..., 1] - 128.0, p[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)


def encode_jpeg(px: np.ndarray, *, quality: int = 50) -> bytes:
    """Baseline sequential JFIF bytes for an HxWx1 (grayscale) or HxWx3
    (RGB) uint8 array.  4:4:4, standard tables scaled by `quality`,
    edge-replicated padding to 8-pixel multiples."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError(f"JPEG encoder supports 1 or 3 channels, got {c}")
    planes = (
        px.astype(np.float64)[..., :1]
        if c == 1
        else _rgb_to_ycbcr(px)
    )
    qt_l = scale_quant_table(STD_LUMA_QT, quality)
    qt_c = scale_quant_table(STD_CHROMA_QT, quality)
    dc_l = _canonical_codes(*DC_LUMA_SPEC)
    ac_l = _canonical_codes(*AC_LUMA_SPEC)
    dc_c = _canonical_codes(*DC_CHROMA_SPEC)
    ac_c = _canonical_codes(*AC_CHROMA_SPEC)

    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = np.empty((ph, pw, c), dtype=np.float64)
    padded[:h, :w] = planes
    padded[h:, :w] = planes[-1:, :]
    padded[:, w:] = padded[:, w - 1 : w]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT (table 0 = luma; table 1 = chroma when color)
    zz_l = qt_l.reshape(-1)[ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(v) for v in zz_l)
    if c == 3:
        zz_c = qt_c.reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(int(v) for v in zz_c)
    # SOF0
    ncomp = c
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    # DHT
    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        body = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, DC_LUMA_SPEC) + dht(1, 0, AC_LUMA_SPEC)
    if c == 3:
        out += dht(0, 1, DC_CHROMA_SPEC) + dht(1, 1, AC_CHROMA_SPEC)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    writer = _BitWriter()
    preds = [0] * ncomp
    comp_q = [qt_l] + [qt_c] * (ncomp - 1)
    comp_dc = [dc_l] + [dc_c] * (ncomp - 1)
    comp_ac = [ac_l] + [ac_c] * (ncomp - 1)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(ncomp):
                block = padded[by : by + 8, bx : bx + 8, ci] - 128.0
                coef = _A @ block @ _A.T
                qcoef = np.round(coef / comp_q[ci]).astype(np.int64)
                preds[ci] = _encode_block(
                    writer, qcoef, preds[ci], comp_dc[ci], comp_ac[ci]
                )
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and RSTn reset
    signalling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> bool:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn: skip, caller resets preds
                self.pos += 2
                self.acc = 0
                self.n = 0
                raise _RestartMarker()
            else:
                raise _EndOfScan()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


class _RestartMarker(Exception):
    pass


class _EndOfScan(Exception):
    pass


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _read_huff(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(b: bytes | None) -> np.ndarray | None:
    """Decode baseline sequential JPEG (8-bit, 1x1 sampling) to an
    HxWxC uint8 array.  Returns None for anything it cannot decode
    (progressive SOF2, subsampled streams, truncated payloads) — the
    malformed-degrades-to-null contract of the media surface."""
    try:
        return _decode_jpeg_inner(b)
    except Exception:
        return None


def _decode_jpeg_inner(b: bytes | None) -> np.ndarray | None:
    if b is None or len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    h = w = None
    comps = []  # (comp_id, qt_id)
    scan_comps = []  # (comp_idx, dc_id, ac_id)
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            return None  # EOI before SOS
        seglen = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec_id = seg[p]
                if prec_id >> 4 != 0:
                    return None  # 16-bit tables: not baseline-8
                tid = prec_id & 0x0F
                flat = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = flat
                qts[tid] = t.reshape(8, 8)
                p += 65
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            if seg[0] != 8:
                return None
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, samp, qid = seg[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    return None  # subsampling unsupported
                comps.append((cid, qid))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / hierarchical
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls_id = seg[p]
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                tab = _decode_table(bits, vals)
                if cls_id >> 4 == 0:
                    dc_tabs[cls_id & 0x0F] = tab
                else:
                    ac_tabs[cls_id & 0x0F] = tab
                p += 17 + nv
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i : 3 + 2 * i]
                idx = next(
                    (k for k, (c0, _) in enumerate(comps) if c0 == cid), None
                )
                if idx is None:
                    return None
                scan_comps.append((idx, tabs >> 4, tabs & 0x0F))
            pos += seglen
            return _decode_scan(
                b, pos, h, w, comps, scan_comps, qts, dc_tabs, ac_tabs
            )
        pos += seglen
    return None


def _decode_scan(b, pos, h, w, comps, scan_comps, qts, dc_tabs, ac_tabs):
    if h is None or not comps or len(scan_comps) != len(comps):
        return None
    nc = len(comps)
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    planes = np.zeros((ph, pw, nc), dtype=np.float64)
    reader = _BitReader(b, pos)
    preds = [0] * nc
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for sc_i, (ci, dc_id, ac_id) in enumerate(scan_comps):
                qt = qts[comps[ci][1]]
                dct = dc_tabs[dc_id]
                act = ac_tabs[ac_id]
                while True:
                    try:
                        zz = np.zeros(64, dtype=np.int64)
                        size = _read_huff(reader, dct)
                        diff = _extend(reader.bits(size), size) if size else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _read_huff(reader, act)
                            if sym == 0x00:  # EOB
                                break
                            run, s = sym >> 4, sym & 0x0F
                            if s == 0:
                                if run != 15:
                                    return None
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                return None
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        break
                    except _RestartMarker:
                        preds = [0] * nc
                        continue
                coef = np.zeros(64, dtype=np.float64)
                coef[ZIGZAG] = zz * qt.reshape(-1)[ZIGZAG]
                block = _A.T @ coef.reshape(8, 8) @ _A + 128.0
                planes[by : by + 8, bx : bx + 8, ci] = block
    planes = planes[:h, :w, :]
    if nc == 3:
        out = _ycbcr_to_rgb(np.clip(np.round(planes), 0, 255))
    else:
        out = np.clip(np.round(planes), 0, 255)
    return out.astype(np.uint8)
