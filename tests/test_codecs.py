"""Dependency-free PNG/BMP/WAV/JPEG codecs: encoder/decoder
round-trips, all five PNG scanline filters against an independent
forward-filter reference, and the real (fake=False) multimodal
decode/resize/frame-sample stages (JPEG tests in test_jpeg.py)."""

import struct
import zlib

import numpy as np
import pytest

from olake_spark.operators.codecs import (
    decode_bmp,
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_avi_mjpeg,
    encode_bmp,
    encode_jpeg,
    encode_png,
    encode_wav,
    parse_avi_mjpeg,
    sniff,
)
from olake_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    resize_images,
    sample_frames,
)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(ch):
    rng = np.random.default_rng(ch)
    arr = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
    out = decode_png(encode_png(arr))
    np.testing.assert_array_equal(out, arr)


def _forward_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Independent reference implementation of the PNG FORWARD filters
    (decoder must invert it)."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(int)
    prev = np.zeros(stride, dtype=int)
    out = bytearray()
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        rec = flat[y]
        for x in range(stride):
            a = int(rec[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((int(rec[x]) - pred) % 256)
        prev = rec
    return bytes(out)


def _wrap_png(raw: bytes, w: int, h: int, color: int) -> bytes:
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_scanline_filters_decode(ftypes):
    rng = np.random.default_rng(sum(ftypes))
    img = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    raw = _forward_filter(img, ftypes)
    png = _wrap_png(raw, 7, 11, color=2)
    np.testing.assert_array_equal(decode_png(png), img)


def test_png_rejects_unsupported_cleanly():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\xff\xd8nope")
    # interlaced flag set
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(img)
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1  # IHDR interlace byte
    # CRC no longer matches but the parser reads fields positionally
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bytes(bad))


def test_bmp_roundtrip_with_row_padding():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # 9B rows pad to 12
    b = encode_bmp(arr)
    assert sniff(b) == "bmp"
    np.testing.assert_array_equal(decode_bmp(b), arr)


def test_bmp_topdown_variant():
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, size=(4, 2, 3), dtype=np.uint8)
    b = bytearray(encode_bmp(arr))
    # flip to top-down: negative height + rows in natural order
    (h,) = struct.unpack("<i", bytes(b[22:26]))
    b[22:26] = struct.pack("<i", -h)
    row_bytes = (2 * 3 + 3) & ~3
    (offset,) = struct.unpack("<I", bytes(b[10:14]))
    rows = [bytes(b[offset + i * row_bytes : offset + (i + 1) * row_bytes]) for i in range(h)]
    b[offset:] = b"".join(reversed(rows))
    np.testing.assert_array_equal(decode_bmp(bytes(b)), arr)


def test_wav_roundtrip_stereo():
    rng = np.random.default_rng(9)
    samples = rng.integers(-30000, 30000, size=(400, 2)).astype(np.int16)
    b = encode_wav(16000, samples)
    assert sniff(b) == "wav"
    rate, out = decode_wav(b)
    assert rate == 16000
    np.testing.assert_array_equal(out, samples)


def test_decode_stub_real_paths_and_unknown_refusal():
    img = np.full((6, 8, 3), 100, dtype=np.uint8)
    w, h, feat = decode_stub(encode_png(img), fake=False)
    assert (w, h) == (8, 6)
    assert feat[0] == 3.0 and feat[1] == pytest.approx(100.0)
    rate_feat = decode_stub(encode_wav(8000, np.ones((100, 1), np.int16)), fake=False)
    assert rate_feat[0] == 100 and rate_feat[1] == 1 and rate_feat[2][0] == 8000.0
    # real JPEG now decodes (operators/jpeg.py)
    jw, jh, jfeat = decode_stub(encode_jpeg(img, quality=95), fake=False)
    assert (jw, jh) == (8, 6)
    assert jfeat[1] == pytest.approx(100.0, abs=2.0)
    with pytest.raises(NotImplementedError, match="unknown"):
        decode_stub(b"\x00\x01not-a-media-payload", fake=False)


def test_spark_extract_and_resize_real(spark):
    rng = np.random.default_rng(11)
    img_png = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    img_bmp = rng.integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
    wav = encode_wav(22050, rng.integers(-100, 100, size=(50, 2)).astype(np.int16))
    df = spark.createDataFrame(
        [("p", bytearray(encode_png(img_png))),
         ("b", bytearray(encode_bmp(img_bmp))),
         ("w", bytearray(wav))],
        "media_id string, payload binary",
    )
    feats = {r.media_id: r for r in extract_features(df, fake=False).collect()}
    assert (feats["p"].width, feats["p"].height) == (12, 16)
    assert (feats["b"].width, feats["b"].height) == (10, 10)
    assert (feats["w"].width, feats["w"].height) == (50, 2)
    assert feats["w"].feat[0] == 22050.0

    imgs = df.filter("media_id != 'w'")
    resized = {r.media_id: r for r in resize_images(imgs, 6, 4, fake=False).collect()}
    out = decode_png(bytes(resized["p"].payload))
    assert out.shape == (4, 6, 3)
    yi = np.arange(4) * 16 // 4
    xi = np.arange(6) * 12 // 6
    np.testing.assert_array_equal(out, img_png[yi][:, xi])


def test_spark_jpeg_extract_resize_real(spark):
    img = np.full((24, 32), 77, dtype=np.uint8)
    df = spark.createDataFrame(
        [("j", bytearray(encode_jpeg(img, quality=95)))],
        "media_id string, payload binary",
    )
    feat = extract_features(df, fake=False).collect()[0]
    assert (feat.width, feat.height) == (32, 24)
    assert abs(feat.feat[1] - 77.0) < 1.5  # pixel mean survives the codec
    resized = resize_images(df, 8, 8, fake=False).collect()[0]
    out = decode_jpeg(bytes(resized.payload))  # stays JPEG, resized
    assert out.shape == (8, 8)
    assert abs(float(out.mean()) - 77.0) < 1.5


def test_spark_sample_frames_real_avi(spark):
    # 10 fps, 12 frames => 1200 ms of video; every_ms=300 -> frames 0,3,6,9
    frames = [
        encode_jpeg(np.full((8, 8), 20 * i, dtype=np.uint8), quality=90)
        for i in range(12)
    ]
    df = spark.createDataFrame(
        [("v", bytearray(encode_avi_mjpeg(frames, fps=10)))],
        "media_id string, payload binary",
    )
    rows = sorted(
        sample_frames(df, every_ms=300, max_frames=3, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.ts_ms) for r in rows] == [(0, 0), (1, 300), (2, 600)]
    for r, src in zip(rows, (0, 3, 6)):
        np.testing.assert_array_equal(
            decode_jpeg(bytes(r.payload)),
            np.full((8, 8), 20 * src, dtype=np.uint8),
        )
