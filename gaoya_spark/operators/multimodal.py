"""Multimodal (image/audio/video) column plumbing.

Images, video, and audio are opaque `binary` columns with typed metadata —
the input_hint schema generalized per modality. All Spark-side plumbing
(schemas, pandas-UDF signatures, Arrow batch shapes, partitioning) is real
and tested; only codec decode is stubbed (no PIL/cv2/ffmpeg/audio libs in
this container) behind clearly-marked NotImplementedError, with an
import-try for Pillow when present.

Raw formats are decodable with numpy alone and keep every operator fully
exercisable in-sandbox:
- images  fmt='raw'      bytes = h*w*3 uint8 RGB (PSNR>=40dB invariant is
                         exactly checkable: raw decode is lossless)
- video   fmt='rawvideo' bytes = n_frames*h*w*3 uint8 RGB frames
- audio   fmt='rawpcm16' bytes = little-endian int16 mono PCM
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, LongType, StringType, StructField, StructType,
)

try:  # optional real codec path
    from PIL import Image  # noqa: F401
    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """bytes -> (h, w, 3) uint8. Only 'raw' is implemented natively."""
    if fmt == "raw":
        arr = np.frombuffer(data, dtype=np.uint8)
        if arr.size != h * w * 3:
            raise ValueError(f"raw buffer size {arr.size} != {h}x{w}x3")
        return arr.reshape(h, w, 3)
    if _HAVE_PIL:
        import io
        from PIL import Image as _I
        return np.asarray(_I.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError(
        f"codec '{fmt}' requires Pillow/cv2 (not in this container); "
        "only fmt='raw' decodes natively"
    )


def encode_raw(pixels: np.ndarray) -> bytes:
    return np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)


def average_hash_pixels(pixels: np.ndarray) -> int:
    """8x8 mean-threshold average hash (deterministic phash stand-in —
    same function as gaoya_spark.fixtures.average_hash)."""
    from gaoya_spark.fixtures import average_hash

    return average_hash(pixels)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize with pure numpy (real implementation for raw
    images; a production build would swap in a codec-backed resampler)."""
    h, w = pixels.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[yi][:, xi]


# ------------------------------------------------------------------ Spark ops

def with_phash(df: DataFrame, out_col: str = "phash_computed") -> DataFrame:
    """Recompute the perceptual hash from pixels with mapInPandas (binary
    columns stream through Arrow in bounded batches; schema is the input
    plus the hash column). Rows with non-raw fmt get NULL (decode stubbed)."""
    out_schema = StructType(df.schema.fields + [StructField(out_col, LongType(), True)])

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for data, fmt, w, h in zip(pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]):
                if data is None:
                    vals.append(None)
                    continue
                try:
                    vals.append(average_hash_pixels(decode_image(data, fmt, int(w), int(h))))
                except NotImplementedError:
                    vals.append(None)
            pdf[out_col] = pd.array(vals, dtype="Int64")
            yield pdf

    return df.mapInPandas(compute, out_schema)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize raw images; returns (image_id, bytes, w, h, fmt). Non-raw
    formats raise (stub) — gate upstream with fmt == 'raw'."""
    schema = StructType([
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", df.schema["w"].dataType, False),
        StructField("h", df.schema["h"].dataType, False),
        StructField("fmt", StringType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                pix = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
                out.append((r.image_id, encode_raw(resize_nearest(pix, out_w, out_h)),
                            out_w, out_h, "raw"))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h", "fmt"])

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(run, schema)


def psnr_check(df_a: DataFrame, df_b: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Per-row decoded-pixel PSNR between two image tables (the input_hint
    invariant: >= 40dB for lossy codecs, exact/inf for raw)."""
    a = df_a.select(F.col(id_col), F.col("bytes").alias("bytes_a"),
                    F.col("fmt").alias("fmt_a"), "w", "h")
    b = df_b.select(F.col(id_col), F.col("bytes").alias("bytes_b"),
                    F.col("fmt").alias("fmt_b"))
    joined = a.join(b, id_col)
    schema = StructType([
        StructField(id_col, StringType(), False),
        StructField("psnr_db", DoubleType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pa = decode_image(r.bytes_a, r.fmt_a, int(r.w), int(r.h))
                pb = decode_image(r.bytes_b, r.fmt_b, int(r.w), int(r.h))
                v = psnr(pa, pb)
                rows.append((getattr(r, id_col), None if np.isinf(v) else float(v)))
            yield pd.DataFrame(rows, columns=[id_col, "psnr_db"])

    return joined.mapInPandas(run, schema)


def decode_video(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """bytes -> (n_frames, h, w, 3) uint8. fmt='rawvideo' = concatenated
    raw RGB frames (decodable with numpy alone); codec formats are STUBBED
    (no ffmpeg/av in this container) behind NotImplementedError."""
    if fmt == "rawvideo":
        arr = np.frombuffer(data, dtype=np.uint8)
        frame = h * w * 3
        if frame == 0 or arr.size % frame:
            raise ValueError(f"rawvideo buffer {arr.size} not a multiple of {h}x{w}x3")
        return arr.reshape(-1, h, w, 3)
    raise NotImplementedError(
        f"video codec '{fmt}' requires ffmpeg/PyAV (not in this container); "
        "only fmt='rawvideo' decodes natively"
    )


def frame_sample(df: DataFrame, every_n: int = 30,
                 id_col: str = "video_id") -> DataFrame:
    """Video frame sampling: explode each video's binary column into one
    row per sampled frame (frame 0, every_n, 2*every_n, ...), each a
    raw-RGB image row ready for the image operators (with_phash, resize,
    minhash-with-phash dedup). Real Spark plumbing — mapInPandas over
    Arrow batches, frames emitted as fmt='raw' rows; only codec decode is
    stubbed (decode_video)."""
    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType, False),
        StructField("frame_idx", LongType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", LongType(), False),
        StructField("h", LongType(), False),
        StructField("fmt", StringType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frames = decode_video(r.bytes, r.fmt, int(r.w), int(r.h))
                for idx in range(0, len(frames), every_n):
                    rows.append((
                        getattr(r, id_col), idx, encode_raw(frames[idx]),
                        int(r.w), int(r.h), "raw",
                    ))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "bytes", "w", "h", "fmt"]
            )

    return df.select(id_col, "bytes", "w", "h", "fmt").mapInPandas(run, schema)


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """bytes -> float64 mono samples in [-1, 1]. fmt='rawpcm16' =
    little-endian int16 mono PCM (numpy-decodable); codec formats STUBBED."""
    if fmt == "rawpcm16":
        return np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    raise NotImplementedError(
        f"audio codec '{fmt}' requires an audio library (not in this "
        "container); only fmt='rawpcm16' decodes natively"
    )


def audio_features(df: DataFrame, id_col: str = "audio_id",
                   rate_col: str = "sample_rate") -> DataFrame:
    """Per-clip audio features over raw PCM: duration, RMS level,
    zero-crossing rate (a pitch/noisiness proxy), and peak amplitude —
    the typical columns a training-data audio-quality filter keys on.
    Vectorized numpy per clip inside mapInPandas; codec decode stubbed
    (decode_audio)."""
    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType, False),
        StructField("n_samples", LongType(), False),
        StructField("duration_s", DoubleType(), False),
        StructField("rms", DoubleType(), False),
        StructField("zero_crossing_rate", DoubleType(), False),
        StructField("peak", DoubleType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = decode_audio(r.bytes, r.fmt)
                sr = int(getattr(r, rate_col))
                zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
                rows.append((
                    getattr(r, id_col), len(x), len(x) / sr if sr else 0.0,
                    float(np.sqrt(np.mean(x ** 2))) if len(x) else 0.0,
                    zc, float(np.max(np.abs(x))) if len(x) else 0.0,
                ))
            yield pd.DataFrame(rows, columns=[
                id_col, "n_samples", "duration_s", "rms",
                "zero_crossing_rate", "peak",
            ])

    return df.select(id_col, "bytes", "fmt", rate_col).mapInPandas(run, schema)
