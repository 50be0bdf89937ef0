"""Dependency-free media codecs: PNG, BMP, WAV with numpy + stdlib only.

The container has no Pillow/ffmpeg, so the multimodal layer's decode
stage was a documented seam.  These decoders close it for the three
formats whose specs need nothing beyond ``zlib`` (stdlib), ``wave``
(stdlib) and numpy:

* PNG (ISO/IEC 15948): 8-bit depth, color types gray / gray+alpha /
  RGB / RGBA, all five scanline filters (None/Sub/Up/Average/Paeth),
  non-interlaced.  Interlaced or exotic-depth files raise ``ValueError``
  with the reason.
* BMP (BITMAPINFOHEADER): 24-bit uncompressed, top-down or bottom-up,
  4-byte row padding, BGR->RGB.
* WAV: PCM-16 via the stdlib ``wave`` module.

Plus ``encode_png`` (filter-0, any supported color type) so resize
stages can re-emit real image payloads.

JPEG (baseline sequential, ITU-T T.81) is handled by the sibling
``operators/jpeg.py`` codec and re-exported here so callers have one
import point.  Video is covered for the one container expressible
with stdlib-only parsing: AVI/MJPEG (RIFF chunks whose '00dc' frames
are whole baseline JPEGs) — ``encode_avi_mjpeg`` / ``parse_avi_mjpeg``
below.  Inter-frame codecs (H.264 etc.) remain out of reach without
ffmpeg and raise ``ValueError`` naming the codec.

Performance note: these run inside ``mapInPandas`` Arrow batches; the
per-row cost is the codec itself (Sub/Average/Paeth unfiltering is a
per-scanline loop).  A production deployment swaps in Pillow for the
hot path; the point here is REAL bytes-to-pixels correctness with the
engine's exact batch/schema contract, verified by round-trip tests.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

from olake_spark.operators.jpeg import decode_jpeg, encode_jpeg

__all__ = [
    "sniff",
    "decode_png", "encode_png",
    "decode_bmp", "encode_bmp",
    "decode_wav", "encode_wav",
    "decode_jpeg", "encode_jpeg",
    "encode_avi_mjpeg", "parse_avi_mjpeg",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(payload: bytes) -> str:
    """Cheap magic-byte format sniff: 'png' | 'bmp' | 'wav' | 'avi' |
    'jpeg' | 'unknown' (mirrors the Catalyst-side media_metadata
    sniff)."""
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return "unknown"


# --------------------------------------------------------------------- PNG
def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (height, width, channels)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("not a PNG: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: per-byte-lane cumulative sum mod 256
            rec = line.reshape(w, ch).cumsum(axis=0).reshape(stride) % 256
        elif ftype == 2:  # Up
            rec = (line + prev) % 256
        elif ftype in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 3:
                    rec[x] = (line[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - ch] if x >= ch else 0
                    rec[x] = (line[x] + _paeth(int(a), int(b), int(c))) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, ch in {1,2,3,4}) -> PNG bytes
    (filter 0, one zlib stream)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------- BMP
def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> uint8 array (height, width, 3) RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    (offset,) = struct.unpack("<I", payload[10:14])
    w = struct.unpack("<i", payload[18:22])[0]
    h_signed = struct.unpack("<i", payload[22:26])[0]
    _planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h_signed > 0
    height = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=offset
    ).reshape(height, row_bytes)[:, : w * 3].reshape(height, w, 3)
    if bottom_up:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> 24-bit bottom-up BMP bytes (test/fixture
    twin of decode_bmp)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, ch = a.shape
    if ch != 3:
        raise ValueError("BMP encoder needs (h, w, 3) RGB")
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = a[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (row_bytes - len(row))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return file_hdr + info + bytes(body)


# --------------------------------------------------------------------- WAV
def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV bytes -> (sample_rate, int16 array (n_samples, channels))."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(
                f"unsupported WAV sample width {wf.getsampwidth()} (only PCM-16)"
            )
        rate = wf.getframerate()
        ch = wf.getnchannels()
        frames = wf.readframes(wf.getnframes())
    samples = np.frombuffer(frames, dtype="<i2").reshape(-1, ch)
    return rate, samples


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """(rate, int16 (n, ch)) -> PCM-16 WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(s.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()


# --------------------------------------------------------- AVI / MJPEG
# Minimal AVI 1.0 (RIFF 'AVI ') container with a single MJPG video
# stream — the one video format where every frame is an independent
# baseline JPEG, so stdlib chunk-walking + operators/jpeg.py covers
# bytes->pixels end to end.  Layout per the public msdn AVI RIFF spec:
# RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
# '00dc'...) idx1).


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def encode_avi_mjpeg(
    frames: list[bytes], fps: int = 25, width: int = 0, height: int = 0
) -> bytes:
    """JPEG frame payloads -> AVI/MJPEG bytes.  width/height default to
    the first frame's decoded size (headers only; frames are stored
    verbatim)."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    if not (width and height):
        first = decode_jpeg(frames[0])
        height, width = first.shape[:2]
    us_per_frame = max(1_000_000 // max(fps, 1), 1)
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<10I",
        us_per_frame, max_bytes * max(fps, 1), 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, width, height,
    ) + b"\x00" * 16  # dwReserved[4]
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHII", 0, 0, 0, 0, 1)  # scale=1
        + struct.pack("<IIIiI", max(fps, 1), 0, len(frames), max_bytes, 0xFFFFFFFF)
        + struct.pack("<I", 0) + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(  # BITMAPINFOHEADER, biCompression='MJPG'
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    strl = _riff_chunk(b"LIST", b"strl" + _riff_chunk(b"strh", strh)
                       + _riff_chunk(b"strf", strf))
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of '00dc' within movi
        movi_body += _riff_chunk(b"00dc", f)
    movi = _riff_chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
        for off, f in zip(offsets, frames)
    )
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_mjpeg(payload: bytes) -> tuple[int, list[bytes]]:
    """AVI bytes -> (microseconds-per-frame, [jpeg frame bytes...]).

    Walks RIFF chunks with stdlib struct only; accepts '00dc'/'00db'
    video chunks.  Non-MJPG streams raise ValueError naming the codec
    (the ffmpeg seam)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF signature")
    us_per_frame = 40_000  # 25 fps default if avih is absent
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal us_per_frame
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            data_end = min(pos + 8 + size, end)
            if fourcc == b"LIST":
                walk(buf, pos + 12, data_end)  # skip list type fourcc
            elif fourcc == b"avih":
                us_per_frame = struct.unpack("<I", buf[pos + 8 : pos + 12])[0] or us_per_frame
            elif fourcc == b"strh":
                if buf[pos + 8 : pos + 12] == b"vids":
                    codec = buf[pos + 12 : pos + 16]
                    if codec not in (b"MJPG", b"mjpg"):
                        raise ValueError(
                            f"unsupported AVI video codec {codec!r}: only "
                            "MJPG decodes natively; others require ffmpeg"
                        )
            elif fourcc in (b"00dc", b"00db") and size:
                frames.append(buf[pos + 8 : data_end])
            pos = pos + 8 + size + (size & 1)  # chunks pad to even

    walk(payload, 12, len(payload))
    if not frames:
        raise ValueError("AVI has no video frames")
    return us_per_frame, frames
