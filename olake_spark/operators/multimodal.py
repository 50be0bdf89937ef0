"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the Spark-side schema, partition behavior, UDF
signatures, and Arrow batch shapes are real and tested.  Decode is REAL
for PNG / BMP / WAV / baseline JPEG / AVI-MJPEG video via the
dependency-free codecs in ``operators/codecs.py`` + ``operators/
jpeg.py`` (stdlib zlib/wave/struct + numpy — all five PNG scanline
filters, 24-bit BMP, PCM-16 WAV, T.81 baseline Huffman JPEG, RIFF
chunk walk), used when ``fake=False``; image resize re-encodes real
PNG/JPEG bytes and ``sample_frames`` extracts real JPEG frames from
AVI containers.  Inter-frame video codecs (H.264 etc.) raise
``ValueError`` naming the codec — the ffmpeg seam; ``fake=True``
keeps the deterministic byte-stats features used by the SQL-oracled
``media_profile`` query.

Scale design: payload bytes never pass through Python except inside
the Arrow batches of ``mapInPandas`` (zero-copy into pandas); metadata
extraction that doesn't need decoding (size, magic bytes) is pure
Catalyst. Batch memory is bounded with maxRecordsPerBatch, not file
count.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id string, n_bytes long, magic string, media_type string"
)

FEATURE_SCHEMA = (
    "media_id string, n_bytes long, width int, height int, feat array<float>"
)

RESIZE_SCHEMA = "media_id string, width int, height int, payload binary"

FRAME_SCHEMA = "media_id string, frame_idx int, ts_ms long, payload binary"


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a deterministic binary payload column from text (the
    testdata has no real media; the plumbing doesn't care)."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Catalyst-only metadata pass: byte length + magic prefix +
    type sniff. No Python, no decode."""
    magic = F.upper(F.hex(F.substring(F.col("payload"), 1, 4)))
    mtype = (
        F.when(magic.startswith("FFD8"), F.lit("image/jpeg"))
        .when(magic.startswith("89504E47"), F.lit("image/png"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return df.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes"),
        magic.alias("magic"),
        mtype.alias("media_type"),
    )


def decode_stub(payload: bytes, fake: bool) -> tuple[int, int, np.ndarray]:
    """The decode stage.  ``fake=True``: deterministic byte-stats
    features (the SQL-oracle-able path).  ``fake=False``: REAL decode —
    PNG/BMP -> (width, height, [channels, pixel mean, pixel std, pixel
    max]); WAV -> (n_samples, n_channels, [rate, mean |x|, rms, peak]);
    Unknown formats raise NotImplementedError."""
    if not fake:
        from olake_spark.operators import codecs

        kind = codecs.sniff(payload)
        if kind in ("png", "bmp", "jpeg"):
            arr = {
                "png": codecs.decode_png,
                "bmp": codecs.decode_bmp,
                "jpeg": codecs.decode_jpeg,
            }[kind](payload)
            h, w = arr.shape[:2]
            ch = arr.shape[2] if arr.ndim == 3 else 1
            px = arr.astype(np.float64)
            feat = np.array(
                [ch, px.mean(), px.std(), px.max()], dtype=np.float32
            )
            return w, h, feat
        if kind == "wav":
            rate, s = codecs.decode_wav(payload)
            x = s.astype(np.float64)
            feat = np.array(
                [rate, np.abs(x).mean(), np.sqrt((x * x).mean()), np.abs(x).max()],
                dtype=np.float32,
            )
            return int(s.shape[0]), int(s.shape[1]), feat
        if kind == "avi":
            us_per_frame, jpegs = codecs.parse_avi_mjpeg(payload)
            first = codecs.decode_jpeg(jpegs[0])
            h, w = first.shape[:2]
            px = first.astype(np.float64)
            feat = np.array(
                [len(jpegs), 1e6 / us_per_frame, px.mean(), px.std()],
                dtype=np.float32,
            )
            return w, h, feat
        raise NotImplementedError(
            f"cannot decode {kind!r}: PNG/BMP/WAV/JPEG/AVI-MJPEG decode "
            "natively (operators/codecs.py, operators/jpeg.py)"
        )
    a = np.frombuffer(payload, dtype=np.uint8)
    h = int(a[:4].sum()) % 480 + 16 if len(a) else 16
    w = int(a[4:8].sum()) % 640 + 16 if len(a) >= 8 else 16
    feat = np.array(
        [len(a), float(a.mean()) if len(a) else 0.0, float(a.min()) if len(a) else 0.0,
         float(a.max()) if len(a) else 0.0],
        dtype=np.float32,
    )
    return w, h, feat


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    UDF shape a decode/resize/frame-sample stage uses: iterator of
    Arrow batches in, bounded memory, one output row per media row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, feat = decode_stub(bytes(payload), fake)
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(payload),
                        "width": w,
                        "height": h,
                        "feat": feat,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize stage: one output row per input, payload replaced by the
    re-encoded image.  ``fake=False``: REAL nearest-neighbor resize of
    PNG/BMP/JPEG payloads — PNG/BMP re-encode as PNG, JPEG re-encodes
    as JPEG (operators/codecs.py); other formats raise
    NotImplementedError.  ``fake=True``: deterministic byte subsample
    to width*height bytes (the oracle-able path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from olake_spark.operators import codecs

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    b = bytes(payload)
                    kind = codecs.sniff(b)
                    if kind not in ("png", "bmp", "jpeg"):
                        raise NotImplementedError(
                            f"cannot resize {kind!r}: PNG/BMP/JPEG "
                            "resize natively (operators/codecs.py)"
                        )
                    arr = {
                        "png": codecs.decode_png,
                        "bmp": codecs.decode_bmp,
                        "jpeg": codecs.decode_jpeg,
                    }[kind](b)
                    yi = np.arange(height) * arr.shape[0] // height
                    xi = np.arange(width) * arr.shape[1] // width
                    small = arr[yi][:, xi]
                    out_bytes = (
                        codecs.encode_jpeg(small)
                        if kind == "jpeg"
                        else codecs.encode_png(small)
                    )
                    rows.append(
                        {
                            "media_id": mid,
                            "width": width,
                            "height": height,
                            "payload": out_bytes,
                        }
                    )
                    continue
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = max(width * height, 1)
                idx = (np.arange(n) * max(len(a), 1) // n) % max(len(a), 1)
                out = a[idx] if len(a) else np.zeros(n, dtype=np.uint8)
                rows.append(
                    {
                        "media_id": mid,
                        "width": width,
                        "height": height,
                        "payload": out.tobytes(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = True
) -> DataFrame:
    """Frame-sampling stage: one input video row fans out to N frame
    rows (the 1->N mapInPandas shape a keyframe extractor uses).
    ``fake=False``: REAL extraction from AVI/MJPEG containers — each
    emitted payload is one whole baseline-JPEG frame, ts_ms from the
    container's frame period, sampled at >= every_ms spacing up to
    max_frames.  Other containers raise ValueError (the ffmpeg seam).
    ``fake=True``: deterministic payload slices; frame count derives
    from payload size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from olake_spark.operators import codecs

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    us_per_frame, jpegs = codecs.parse_avi_mjpeg(bytes(payload))
                    # emit every ceil(every_ms / frame_period)-th frame
                    stride = max(round(every_ms * 1000 / us_per_frame), 1)
                    for out_idx, src_idx in enumerate(
                        range(0, len(jpegs), stride)
                    ):
                        if out_idx >= max_frames:
                            break
                        rows.append(
                            {
                                "media_id": mid,
                                "frame_idx": out_idx,
                                "ts_ms": src_idx * us_per_frame // 1000,
                                "payload": jpegs[src_idx],
                            }
                        )
                    continue
                b = bytes(payload)
                n_frames = min(max(len(b) // 16, 1), max_frames)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "payload": b[i * step : (i + 1) * step],
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)
