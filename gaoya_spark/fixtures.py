"""Deterministic synthetic fixtures (FIXTURES.md F1-F7). Seeds fixed; no
external data. The images table follows BASELINE.json's input_hint schema
exactly: (image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
    ]
)

def _make_vocab(n: int = 6000, seed: int = 1234) -> list[str]:
    """Deterministic pseudo-natural vocabulary. Needs to be large and
    lexically diverse: with a tiny vocabulary every unrelated caption pair
    shares most char shingles (est. jaccard ~0.35), and banded LSH at
    (42, 3) then emits nearly all n^2/2 pairs as candidates — unlike real
    web captions where unrelated pairs sit near 0."""
    rng = np.random.default_rng(seed)
    onsets = ["b", "br", "c", "ch", "d", "dr", "f", "fl", "g", "gr", "h", "j",
              "k", "kl", "l", "m", "n", "p", "pr", "qu", "r", "s", "st", "str",
              "t", "tr", "v", "w", "x", "z"]
    vowels = ["a", "e", "i", "o", "u", "ai", "ea", "io", "ou"]
    codas = ["", "n", "r", "s", "t", "l", "m", "ck", "nd", "st", "ng"]
    words = set()
    while len(words) < n:
        k = int(rng.integers(2, 4))
        w = "".join(
            onsets[int(rng.integers(len(onsets)))]
            + vowels[int(rng.integers(len(vowels)))]
            + codas[int(rng.integers(len(codas)))]
            for _ in range(k)
        )
        words.add(w)
    return sorted(words)


_VOCAB = _make_vocab()

CORPUS5 = [
    (0, "This is the first document."),
    (1, "This document is the second document."),
    (2, "And this is the third document."),
    (3, "Is this the first document?"),
    (4, "This not the first nor the second nor the third, but the fourth document"),
]


def average_hash(pixels: np.ndarray) -> int:
    """8x8 mean-threshold average hash over the grayscale image — the
    deterministic phash stand-in (FIXTURES.md F1). pixels: (h, w, 3) uint8."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # downsample to 8x8 by block means (crop to multiple of 8)
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    g = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (g > g.mean()).astype(np.uint64).ravel()
    val = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return val - (1 << 64) if val >= (1 << 63) else val


def _flip_bits(ph: int, rng: np.random.Generator, n_flips: int) -> int:
    u = ph & 0xFFFFFFFFFFFFFFFF
    for f in rng.integers(0, 64, size=n_flips):
        u ^= 1 << int(f)
    return u - (1 << 64) if u >= (1 << 63) else u


def _caption(rng: np.random.Generator, n_lo=8, n_hi=24) -> str:
    n = int(rng.integers(n_lo, n_hi + 1))
    return " ".join(rng.choice(_VOCAB, size=n))


def _edit_caption(rng: np.random.Generator, caption: str, n_edits: int) -> str:
    words = caption.split(" ")
    for _ in range(n_edits):
        op = rng.integers(0, 2)
        i = int(rng.integers(0, len(words)))
        if op == 0 or len(words) <= 4:
            words[i] = str(rng.choice(_VOCAB))
        else:
            del words[i]
    return " ".join(words)


def make_images_pdf(
    n: int,
    seed: int = 42,
    dup_frac: float = 0.2,
    with_bytes: bool = True,
    sizes=(32, 48, 64),
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (images_pdf, truth_pdf). truth: (image_id, group_id) where a
    shared group_id means near-duplicates (FIXTURES.md F1 planting rules:
    caption edits <=3 words, pixel noise <=1 LSB on <=5% pixels, phash flips
    <=3 bits)."""
    rng = np.random.default_rng(seed)
    rows = []
    truth = []
    i = 0
    group = 0
    n_dup_members = int(n * dup_frac)
    while i < n:
        in_dup = i < n_dup_members
        k = int(rng.integers(2, 9)) if in_dup else 1
        k = min(k, n - i)
        w = int(rng.choice(sizes))
        h = int(rng.choice(sizes))
        base_pix = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8) if with_bytes else None
        base_cap = _caption(rng)
        for j in range(k):
            img_id = f"img{i:010d}"
            if j == 0:
                cap, pix = base_cap, base_pix
            else:
                # FIXTURES.md F1: edits must keep char-shingle jaccard above
                # the 0.5 threshold — scale edit count with caption length
                # (1 edit for short captions, up to 3 for 24-word ones)
                n_words = base_cap.count(" ") + 1
                max_edits = max(1, min(3, n_words // 8))
                cap = _edit_caption(rng, base_cap, int(rng.integers(1, max_edits + 1)))
                if with_bytes:
                    pix = base_pix.copy()
                    nnoise = int(0.05 * pix.size * rng.random())
                    if nnoise:
                        flat = pix.reshape(-1)
                        idx = rng.integers(0, flat.size, size=nnoise)
                        delta = rng.choice([-1, 1], size=nnoise)
                        flat[idx] = np.clip(
                            flat[idx].astype(np.int16) + delta, 0, 255
                        ).astype(np.uint8)
                else:
                    pix = None
            if with_bytes:
                ph = average_hash(pix) if j == 0 else _flip_bits(
                    average_hash(pix), rng, int(rng.integers(0, 4))
                )
            else:
                if j == 0:
                    ph = int(rng.integers(-(1 << 62), 1 << 62))
                else:
                    ph = _flip_bits(rows[i - j][6], rng, int(rng.integers(0, 4)))
            rows.append(
                (
                    img_id,
                    pix.tobytes() if with_bytes else None,
                    w,
                    h,
                    "raw",
                    cap,
                    ph,
                )
            )
            truth.append((img_id, group))
            i += 1
        group += 1
    images = pd.DataFrame(
        rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )
    truth_pdf = pd.DataFrame(truth, columns=["image_id", "group_id"])
    return images, truth_pdf


def make_images_df(
    spark: SparkSession, n: int, seed: int = 42, dup_frac: float = 0.2,
    with_bytes: bool = True, partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    pdf, truth = make_images_pdf(n, seed, dup_frac, with_bytes)
    df = spark.createDataFrame(pdf, schema=IMAGES_SCHEMA)
    tdf = spark.createDataFrame(truth)
    if partitions:
        df = df.repartition(partitions)
    return df, tdf


def corpus5_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(CORPUS5, "id long, text string")


def token_vectors_pdf(seed: int = 42) -> pd.DataFrame:
    """F4 — port of the clone-with-k-changes recall corpus
    (/root/reference/gaoya/src/minhash/minhash_index.rs:1033-1083): 3 base
    vectors of 1000 random ints; 99 clones each with 100/50/10 mutated
    positions; ids 0..299 (id 0/100/200 are the unmutated bases)."""
    rng = np.random.default_rng(seed)
    rows = []
    next_id = 0
    for n_changes in (100, 50, 10):
        base = rng.integers(1, 100_000, size=1000).astype(np.int64)
        rows.append((next_id, base.tolist()))
        next_id += 1
        for _ in range(99):
            clone = base.copy()
            idx = rng.choice(1000, size=n_changes, replace=False)
            clone[idx] = rng.integers(1, 100_000, size=n_changes)
            rows.append((next_id, clone.tolist()))
            next_id += 1
    return pd.DataFrame(rows, columns=["id", "tokens"])


def perturbed_docs_pdf(seed: int = 7) -> pd.DataFrame:
    """F6 — simhash index-vs-brute-force fixture
    (/root/reference/gaoya/src/simhash/sim_hash_index.rs:261-272): base
    tokens 1..20; 100 copies each with one position randomized."""
    rng = np.random.default_rng(seed)
    base = np.arange(1, 21, dtype=np.int64)
    rows = [(0, base.tolist())]
    for i in range(1, 101):
        c = base.copy()
        c[int(rng.integers(0, 20))] = int(rng.integers(1, 1000))
        rows.append((i, c.tolist()))
    return pd.DataFrame(rows, columns=["id", "tokens"])


def substring_fixture_pdf(n: int = 400, seed: int = 11, sub_len: int = 30) -> tuple[pd.DataFrame, pd.DataFrame]:
    """F7 — ~5% of captions contain a verbatim >=24-char substring copied
    from another row. Returns (docs, truth (src_id, dst_id))."""
    rng = np.random.default_rng(seed)
    caps = [_caption(rng, 10, 20) for _ in range(n)]
    truth = []
    n_plant = max(n // 20, 1)
    for t in range(n_plant):
        src = int(rng.integers(0, n))
        dst = int(rng.integers(0, n))
        if src == dst or len(caps[src]) < sub_len:
            continue
        start = int(rng.integers(0, len(caps[src]) - sub_len))
        sub = caps[src][start : start + sub_len]
        caps[dst] = caps[dst] + " " + sub
        truth.append((src, dst))
    docs = pd.DataFrame({"id": range(n), "text": caps})
    return docs, pd.DataFrame(truth, columns=["src_id", "dst_id"]).drop_duplicates()
