"""Dependency-free baseline JPEG codec (ITU-T T.81) with numpy + stdlib.

Closes the last documented decode seam in the multimodal layer: the
container has no Pillow, so JPEG payloads previously raised
``NotImplementedError``.  Everything here is the public baseline
sequential DCT process from the JPEG spec (ITU-T T.81 / ISO 10918-1)
and the JFIF conventions:

* decoder: SOI/APPn/DQT/SOF0-1/DHT/DRI/SOS/RSTn/EOI marker walk,
  canonical Huffman entropy decode (spec F.2.2.3 MINCODE/MAXCODE),
  dequantize + de-zigzag, 8x8 IDCT as an orthonormal matrix product,
  nearest-neighbor chroma upsampling for 4:2:0 / 4:2:2, BT.601
  YCbCr -> RGB.  Progressive (SOF2), arithmetic, hierarchical and
  12-bit streams raise ``ValueError`` with the reason.
* encoder: quality-scaled Annex-K quantization tables (IJG scaling),
  Annex-K typical Huffman tables, 4:4:4 or 4:2:0 (2x2-mean chroma
  subsample), byte-stuffed entropy coding, optional restart markers.

Lossy by design — round-trip tests assert PSNR, plus an exactness
check on constant blocks and an independent O(N^4) DCT-II reference
for the transform itself.

Performance note: entropy decode is a per-bit Python loop — fine for
the mapInPandas test path (small images); a production deployment
swaps in Pillow/libjpeg-turbo behind the same ``decode_jpeg`` seam.
Reference behavior anchor: OLake treats media payloads as opaque
bytes end-to-end; this layer is the beyond-reference training-data
extension (SURVEY.md §2.8 multimodal rows).
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: index i in scan order -> position in natural (row-major)
# 8x8 order (T.81 Figure A.6).
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

# Annex K.1 luminance / K.2 chrominance quantization tables (zigzag order
# is NOT used here; these are natural row-major order as printed in the spec).
QT_LUM = np.array(
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
    dtype=np.int64,
)
QT_CHROM = np.array(
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
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (BITS counts for lengths 1..16, HUFFVAL).
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
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
HUFF_AC_CHROM = (
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


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: coefs = C @ block @ C.T,
    block = C.T @ coefs @ C."""
    x = np.arange(8, dtype=np.float64)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


# -------------------------------------------------------------- bit I/O
class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker: int | None = None  # marker that ended the segment

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy data ended at marker prematurely")
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated at 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # A real marker terminates the entropy segment; spec says
                # a decoder may pad with 1-bits past the end.
                self.marker = nxt
                self.pos += 1
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                return
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self, expected: int) -> None:
        """Consume an RSTn marker at a restart boundary (byte-aligned)."""
        self.buf = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet consumed by _fill: scan it from the stream
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
        m = self.marker
        if m is None or not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RST marker, got {m!r}")
        if (m - 0xD0) != expected:
            raise ValueError(f"restart marker out of order: {m - 0xD0} != {expected}")
        self.marker = None


class _BitWriter:
    """Entropy-segment bit writer with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec F.1.2.3)


# ----------------------------------------------------- Huffman tables
class _HuffDecoder:
    """Canonical Huffman decode via MINCODE/MAXCODE/VALPTR (T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], huffval: list[int]):
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        for length in range(1, 17):
            if bits[length - 1] == 0:
                self.maxcode[length] = -1
                code <<= 1
                continue
            self.valptr[length] = k
            self.mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            self.maxcode[length] = code - 1
            code <<= 1
        self.huffval = huffval

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            if length >= 16:
                raise ValueError("invalid JPEG Huffman code")
            code = (code << 1) | br.read_bit()
            length += 1
        return self.huffval[self.valptr[length] + code - self.mincode[length]]


def _huff_encode_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from canonical (BITS, HUFFVAL)."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude code to a signed value."""
    if s == 0:
        return 0
    if v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


def _category(x: int) -> int:
    """Bit-size category of a signed DCT value (0 for 0)."""
    return int(abs(x)).bit_length()


# --------------------------------------------------------------- decoder
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array (h, w) gray or (h, w, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    qt: dict[int, np.ndarray] = {}
    hufftabs: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq), ...])
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2:
            # a 0/1 segment length can't even cover its own length field;
            # without this check a corrupt byte pins the walk in place
            raise ValueError(f"corrupt JPEG segment length {seglen}")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    raw = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p).astype(np.int64)
                    p += 64
                else:
                    raw = np.frombuffer(seg, dtype=">u2", count=64, offset=p).astype(np.int64)
                    p += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = raw
                qt[tq] = nat
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline/extended sequential
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hs, vs = seg[7 + 3 * i] >> 4, seg[7 + 3 * i] & 15
                tq = seg[8 + 3 * i]
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF marker 0xFF{marker:02X}); "
                "only baseline/extended sequential Huffman"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                hufftabs[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs = seg[1 + 2 * i]
                td, ta = seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 15
                scan.append((cs, td, ta))
            return _decode_scan(
                payload, pos + seglen, frame, scan, qt, hufftabs, restart_interval
            )
        pos += seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(data, pos, frame, scan, qt, hufftabs, restart_interval):
    h, w, comps = frame
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    if any(hs < 1 or vs < 1 for _, hs, vs, _ in comps):
        raise ValueError("corrupt JPEG sampling factors")
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    meta = []  # (cid, hs, vs, q, dc_dec, ac_dec)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        hs, vs, tq = by_id[cs]
        planes[cs] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        if (0, td) not in hufftabs or (1, ta) not in hufftabs:
            raise ValueError("JPEG scan references missing Huffman table")
        if tq not in qt:
            raise ValueError(f"JPEG scan references missing quant table {tq}")
        meta.append((cs, hs, vs, qt[tq].astype(np.float64), hufftabs[(0, td)], hufftabs[(1, ta)]))
    br = _BitReader(data, pos)
    dc_pred = {cs: 0 for cs, *_ in meta}
    rst_idx = 0
    mcu_count = 0
    coef = np.zeros(64, dtype=np.float64)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart(rst_idx % 8)
                rst_idx += 1
                dc_pred = {cs: 0 for cs, *_ in meta}
            for cs, hs, vs, q, dc_dec, ac_dec in meta:
                for v in range(vs):
                    for u in range(hs):
                        coef[:] = 0.0
                        s = dc_dec.decode(br)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        dc_pred[cs] += diff
                        coef[0] = dc_pred[cs]
                        k = 1
                        while k < 64:
                            rs = ac_dec.decode(br)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            coef[ZIGZAG[k]] = _extend(br.read_bits(s), s)
                            k += 1
                        block = _C.T @ (coef * q).reshape(8, 8) @ _C
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + u) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = block + 128.0
            mcu_count += 1
    # upsample to full resolution and crop
    out = []
    for cs, hs, vs, _q, _d, _a in meta:
        p = planes[cs]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    if len(out) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out)}")
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- encoder
def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables (public convention)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QT_LUM * scale + 50) // 100, 1, 255)
    chrom = np.clip((QT_CHROM * scale + 50) // 100, 1, 255)
    return lum, chrom


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    dc_tab: dict,
    ac_tab: dict,
    dc_pred: int,
) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    qc = np.round(coef.reshape(64) / q).astype(np.int64)[ZIGZAG]  # zigzag order
    dc = int(qc[0])
    diff = dc - dc_pred
    s = _category(diff)
    code, length = dc_tab[s]
    bw.write(code, length)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(v, s)
    run = 0
    last_nz = int(np.max(np.nonzero(qc)[0])) if np.any(qc[1:]) else 0
    for k in range(1, 64):
        ac = int(qc[k])
        if ac == 0:
            if k > last_nz:
                code, length = ac_tab[0x00]  # EOB
                bw.write(code, length)
                break
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(ac)
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        v = ac if ac >= 0 else ac + (1 << s) - 1
        bw.write(v, s)
        run = 0
    return dc


def _pad_to_block(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // bh) * bh
    pw = -(-w // bw_) * bw_
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> baseline JFIF JPEG bytes.

    ``subsample``: '4:4:4' (full chroma) or '4:2:0' (2x2-mean chroma).
    ``restart_interval``: MCUs between RSTn markers (0 = none).
    """
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("encode_jpeg needs (h, w) gray or (h, w, 3) RGB")
    if subsample not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsample!r}")
    h, w = a.shape[:2]
    lum_q, chrom_q = _quality_tables(quality)
    if gray:
        ycc = [a]
    else:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ycc = [y, cb, cr]
    sub420 = (not gray) and subsample == "4:2:0"
    if sub420:
        # 2x2 mean chroma; luma padded to 16 so chroma blocks align
        y = _pad_to_block(ycc[0], 16, 16)
        cpad = [_pad_to_block(c, 16, 16) for c in ycc[1:]]
        ycc = [y] + [
            c.reshape(c.shape[0] // 2, 2, c.shape[1] // 2, 2).mean(axis=(1, 3))
            for c in cpad
        ]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        ycc = [_pad_to_block(c, 8, 8) for c in ycc]
        samp = [(1, 1)] * len(ycc)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tq: int, table: np.ndarray) -> bytes:
        zz = table[ZIGZAG].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz

    out += dqt(0, lum_q)
    if not gray:
        out += dqt(1, chrom_q)

    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        hs, vs = samp[i]
        sof += struct.pack(">BBB", i + 1, (hs << 4) | vs, 0 if i == 0 else 1)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc: int, th: int, spec: tuple) -> bytes:
        bits, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, HUFF_DC_LUM) + dht(1, 0, HUFF_AC_LUM)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROM) + dht(1, 1, HUFF_AC_CHROM)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += struct.pack(">BB", i + 1, 0 if i == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    enc_dc = [_huff_encode_table(*HUFF_DC_LUM)] + (
        [] if gray else [_huff_encode_table(*HUFF_DC_CHROM)] * 2
    )
    enc_ac = [_huff_encode_table(*HUFF_AC_LUM)] + (
        [] if gray else [_huff_encode_table(*HUFF_AC_CHROM)] * 2
    )
    qtabs = [lum_q.astype(np.float64)] + ([] if gray else [chrom_q.astype(np.float64)] * 2)

    hmax = max(s[0] for s in samp[:ncomp])
    vmax = max(s[1] for s in samp[:ncomp])
    mcus_x = ycc[0].shape[1] // (8 * hmax)
    mcus_y = ycc[0].shape[0] // (8 * vmax)
    bw = _BitWriter()
    dc_pred = [0] * ncomp
    rst_idx = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bytes(bw.out)
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                rst_idx += 1
                dc_pred = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for v in range(vs):
                    for u in range(hs):
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + u) * 8
                        block = ycc[ci][y0 : y0 + 8, x0 : x0 + 8]
                        dc_pred[ci] = _encode_block(
                            bw, block, qtabs[ci], enc_dc[ci], enc_ac[ci], dc_pred[ci]
                        )
            mcu_count += 1
    bw.flush()
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
