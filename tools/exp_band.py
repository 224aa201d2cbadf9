"""Round-5 experiment: where does img_minhash_dedup's time go, and does
replacing the JVM banding (transform over 50 array slices + xxhash64 +
explode -> 5M rows) with a vectorized numpy band kernel (one mapInPandas
pass emitting (sid, bk) straight from the stacked signature matrix) help?

Variants (interleaved, per-variant MIN):
  bands_jvm  : _sid_bands(sigs).count()            — banding cost only
  bands_np   : numpy band kernel .count()          — fused alternative
  cand_jvm   : sid_candidates via JVM banding      — banding + buckets + m
  cand_np    : same buckets machinery over numpy bands
  full_jvm   : current dedup_pairs(numpy_verify)   — the bench number
  full_np    : numpy bands -> buckets -> numpy verify

Usage: python tools/exp_band.py [corpus: doc|img] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def numpy_bands(sig_df, cfg):
    """(sid, bk) via one Arrow pass: stack the batch's signatures into an
    (n, k) matrix, reshape (n, b, r), fold each band slice with splitmix64
    seeded by the band index — no per-band JVM array slices, no explode."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from gaoya_spark import hashing

    b, r = cfg.num_bands, cfg.band_width

    def kernel(it):
        seeds = hashing.splitmix64(np.arange(b, dtype=np.int64))
        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            mat = np.stack(pdf["sig"].to_numpy()).astype(np.uint64).reshape(n, b, r)
            acc = np.broadcast_to(seeds, (n, b)).copy()
            for j in range(r):
                acc = hashing.splitmix64((acc ^ mat[:, :, j]).view(np.int64))
            yield pd.DataFrame(
                {
                    "sid": np.repeat(pdf["sid"].to_numpy(), b),
                    "bk": acc.view(np.int64).ravel(),
                }
            )

    return sig_df.select(F.xxhash64("id").alias("sid"), "sig").mapInPandas(
        kernel, "sid long, bk long"
    )


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "img"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{min(3 * CPUS, 72)}g")

    from gaoya_spark.config import MinHashConfig, TokenizerSpec
    from gaoya_spark.operators._bucket_pairs import sid_pairs_from_buckets
    from gaoya_spark.operators.minhash_lsh import MinHashLSH
    from gaoya_spark.session import get_spark

    spark = get_spark("exp_band", cores=CPUS)
    char34 = TokenizerSpec(kind="char", n_from=3, n_to=4, lowercase=True)
    if corpus == "doc":
        df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        id_col, text_col, phash = "doc_id", "text", None
    else:
        df = spark.read.parquet("/tmp/gaoya_bench_images_100000")
        id_col, text_col, phash = "image_id", "caption", "phash"
    df = df.repartition(CPUS * 2).cache()
    df.count()
    cfg = MinHashConfig(
        num_bands=50, band_width=4, threshold=0.5, tokenizer=char34,
        phash_token_weight=1 if phash else 0,
    )
    mh = MinHashLSH(cfg)
    sigs = mh.signatures(df, id_col, text_col, phash_col=phash).cache()
    sigs.count()

    def full_np():
        cand = sid_pairs_from_buckets(numpy_bands(sigs, cfg))
        return mh._numpy_verify(cand, sigs, 0.5, with_m=True).count()

    variants = {
        "bands_jvm": lambda: mh._sid_bands(sigs).count(),
        "bands_np": lambda: numpy_bands(sigs, cfg).count(),
        "cand_jvm": lambda: mh.sid_candidates(sigs).count(),
        "cand_np": lambda: sid_pairs_from_buckets(numpy_bands(sigs, cfg)).count(),
        "full_jvm": lambda: mh.dedup_pairs(
            sigs, keep_sim=False, numpy_verify=True
        ).count(),
        "full_np": full_np,
        "fused": lambda: mh.dedup_pairs(
            sigs, keep_sim=False, numpy_verify="fused"
        ).count(),
    }
    res: dict[str, float] = {}
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            n = fn()
            dt = time.time() - t0
            res[name] = min(res.get(name, 1e9), dt)
            print(f"  {name}: {dt:6.2f}s n={n}", flush=True)
    print("MIN:", {k: round(v, 2) for k, v in res.items()}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
