"""Baseline JPEG codec (operators/jpeg.py): encode/decode round-trip
PSNR, constant-block exactness, an independent O(N^4) DCT-II reference
for the transform, restart-marker equivalence, subsampling, and the
AVI/MJPEG container round-trip feeding the real sample_frames path."""

import struct

import numpy as np
import pytest

from olake_spark.operators.codecs import (
    encode_avi_mjpeg,
    parse_avi_mjpeg,
    sniff,
)
from olake_spark.operators.jpeg import _C, ZIGZAG, decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_dct_matrix_against_naive_reference():
    # independent O(N^4) DCT-II (orthonormal) per the textbook formula
    ref = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            ref[k, n] = np.cos(np.pi * (2 * n + 1) * k / 16)
        ref[k] *= np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)
    np.testing.assert_allclose(_C, ref, atol=1e-12)
    # orthonormal: C @ C.T == I, so IDCT == C.T @ X @ C inverts exactly
    np.testing.assert_allclose(_C @ _C.T, np.eye(8), atol=1e-12)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_gray_constant_block_exact():
    # a constant plane has only a DC coefficient -> quantization-exact
    img = np.full((8, 8), 131, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("quality,min_psnr", [(95, 40.0), (75, 33.0)])
def test_gray_roundtrip_psnr(quality, min_psnr):
    rng = np.random.default_rng(7)
    x, y = np.meshgrid(np.arange(40), np.arange(24))
    img = ((np.sin(x / 5) + np.cos(y / 3)) * 60 + 128 + rng.normal(0, 4, (24, 40)))
    img = np.clip(img, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert out.shape == img.shape
    assert _psnr(img, out) >= min_psnr


@pytest.mark.parametrize("subsample,min_psnr", [("4:4:4", 35.0), ("4:2:0", 28.0)])
def test_rgb_roundtrip_psnr(subsample, min_psnr):
    rng = np.random.default_rng(3)
    x, y = np.meshgrid(np.arange(33), np.arange(21))  # non-multiple-of-16 dims
    img = np.stack(
        [
            np.clip(np.sin(x / 4) * 100 + 128, 0, 255),
            np.clip(np.cos(y / 6) * 100 + 128, 0, 255),
            np.clip((x + y) * 3 % 256, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=92, subsample=subsample))
    assert out.shape == img.shape
    assert _psnr(img, out) >= min_psnr


def test_restart_markers_decode_to_same_pixels():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(32, 48), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    with_rst = encode_jpeg(img, quality=85, restart_interval=3)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
    np.testing.assert_array_equal(decode_jpeg(with_rst), plain)


def test_progressive_and_garbage_refused():
    img = np.full((8, 8), 90, dtype=np.uint8)
    b = bytearray(encode_jpeg(img))
    sof = b.find(b"\xff\xc0")
    b[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_avi_mjpeg_roundtrip():
    frames = [
        encode_jpeg(np.full((16, 16), 40 * (i + 1), dtype=np.uint8), quality=90)
        for i in range(5)
    ]
    avi = encode_avi_mjpeg(frames, fps=10)
    assert sniff(avi) == "avi"
    us_per_frame, out = parse_avi_mjpeg(avi)
    assert us_per_frame == 100_000
    assert [bytes(f) for f in out] == frames  # frames stored verbatim
    # constant frames survive the lossy codec exactly
    np.testing.assert_array_equal(
        decode_jpeg(out[2]), np.full((16, 16), 120, dtype=np.uint8)
    )


def test_corrupt_payloads_raise_fast_never_hang():
    """Decode inside a 100 TB mapInPandas must fail loudly on corrupt
    bytes, never loop: every single-byte mutation / truncation of a
    valid stream either still decodes or raises a bounded error."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_jpeg(img, quality=80)
    rng = np.random.default_rng(0)
    for _ in range(300):
        b = bytearray(good)
        i = int(rng.integers(2, len(b)))  # keep SOI so it's "a JPEG"
        b[i] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(b))
        except (ValueError, IndexError, struct.error):
            pass
    for cut in range(2, len(good), 7):
        try:
            decode_jpeg(good[:cut])
        except (ValueError, IndexError, struct.error):
            pass
    # the specific hang shape: a zero segment length must raise, not spin
    b = bytearray(good)
    dqt = b.find(b"\xff\xdb")
    b[dqt + 2 : dqt + 4] = b"\x00\x00"
    with pytest.raises(ValueError, match="segment length"):
        decode_jpeg(bytes(b))


def test_avi_non_mjpg_codec_refused():
    frames = [encode_jpeg(np.full((8, 8), 10, dtype=np.uint8))]
    avi = bytearray(encode_avi_mjpeg(frames, fps=25))
    pos = avi.find(b"vidsMJPG")
    avi[pos + 4 : pos + 8] = b"H264"
    with pytest.raises(ValueError, match="H264"):
        parse_avi_mjpeg(bytes(avi))
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi_mjpeg(b"nope")
