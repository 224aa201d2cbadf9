"""Multimodal (image/audio/video) column plumbing.

Images are opaque `binary` columns with typed metadata (w, h, fmt) — the
input_hint schema. All Spark-side plumbing (schemas, pandas-UDF signatures,
Arrow batch shapes, partitioning) is real and tested; only non-'raw' codec
decode is stubbed (no PIL/cv2 in this container) behind a clearly-marked
NotImplementedError with an import-try for Pillow when present.

fmt == 'raw' means bytes = h*w*3 uint8 RGB — decodable with numpy alone,
so the PSNR>=40dB per-row invariant (BASELINE.json input_hint) is exactly
checkable in-sandbox (raw decode is lossless => PSNR = inf).
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


def frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling STUB: no video codec exists in this container.
    The Spark-side contract (binary column in, exploded frame rows out) is
    defined; calling it raises until a codec is available."""
    raise NotImplementedError(
        "video decode requires a codec library not present in this container; "
        "the plumbing contract is (video binary, meta) -> rows of "
        "(video_id, frame_idx, frame_bytes, w, h, fmt='raw')"
    )


def audio_features(df: DataFrame) -> DataFrame:
    """Audio feature extraction STUB (no audio libs in container)."""
    raise NotImplementedError(
        "audio decode requires an audio library not present in this container"
    )
