"""Round-4 experiment: verify-kernel variants on the real candidate
workloads (img 100k + doc sf0.1).

Materializes the verify input (m, pa, pb) once per workload, then times
each kernel over the SAME persisted frame, interleaved reps, per-kernel
MIN. Also records n_cand and the m-sure share (pairs the band bound
already resolves) to size the sure/unsure split opportunity.

Kernels:
  agg_packed    - current: zip_with XOR + aggregate fold (2 halves/word)
  filter_packed - zip_with XOR + size(filter(hi==0)) + size(filter(lo==0))
  exists_not    - 2*nw - size(filter(hi!=0)) - size(filter(lo!=0))
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
IMAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "100000"))


def kernels(k: int):
    from pyspark.sql import functions as F

    def agg_packed(pa, pb):
        x = F.zip_with(pa, pb, lambda a, b: a.bitwiseXOR(b))
        cnt = F.aggregate(
            x, F.lit(0),
            lambda acc, w: acc
            + F.when(F.shiftrightunsigned(w, 32) == 0, 1).otherwise(0)
            + F.when(w.bitwiseAND(F.lit(0xFFFFFFFF)) == 0, 1).otherwise(0),
        )
        return (cnt - 1 if k % 2 else cnt).cast("double") / F.lit(float(k))

    def filter_packed(pa, pb):
        x = F.zip_with(pa, pb, lambda a, b: a.bitwiseXOR(b))
        hi = F.size(F.filter(x, lambda w: F.shiftrightunsigned(w, 32) == 0))
        lo = F.size(F.filter(x, lambda w: w.bitwiseAND(F.lit(0xFFFFFFFF)) == 0))
        cnt = hi + lo
        return (cnt - 1 if k % 2 else cnt).cast("double") / F.lit(float(k))

    def exists_not(pa, pb):
        nw = (k + 1) // 2
        x = F.zip_with(pa, pb, lambda a, b: a.bitwiseXOR(b))
        hi_ne = F.size(F.filter(x, lambda w: F.shiftrightunsigned(w, 32) != 0))
        lo_ne = F.size(F.filter(x, lambda w: w.bitwiseAND(F.lit(0xFFFFFFFF)) != 0))
        cnt = F.lit(2 * nw) - hi_ne - lo_ne
        return (cnt - 1 if k % 2 else cnt).cast("double") / F.lit(float(k))

    return {"agg_packed": agg_packed, "filter_packed": filter_packed,
            "exists_not": exists_not}


def main() -> None:
    from pyspark.sql import functions as F

    from gaoya_spark.config import MinHashConfig, TokenizerSpec
    from gaoya_spark.fixtures import make_images_pdf
    from gaoya_spark.functions.similarity import pack_signature_col
    from gaoya_spark.operators.minhash_lsh import MinHashLSH
    from gaoya_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("exp_kernel", cores=CPUS)
    char34 = TokenizerSpec(kind="char", n_from=3, n_to=4, lowercase=True)

    workloads = {}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS * 2).cache()
    docs.count()
    doc_mh = MinHashLSH(MinHashConfig(num_bands=50, band_width=4, threshold=0.5, tokenizer=char34))
    workloads["doc"] = (doc_mh, doc_mh.signatures(docs, "doc_id", "text").cache())

    images_path = f"/tmp/gaoya_bench_images_{IMAGES_N}"
    if not os.path.exists(os.path.join(images_path, "_SUCCESS")):
        images_pdf, _ = make_images_pdf(IMAGES_N, seed=42, dup_frac=0.2, with_bytes=False)
        spark.createDataFrame(
            images_pdf[["image_id", "caption", "phash"]]
        ).repartition(64).write.mode("overwrite").parquet(images_path)
    images = spark.read.parquet(images_path).repartition(CPUS * 3).cache()
    images.count()
    img_mh = MinHashLSH(
        MinHashConfig(num_bands=50, band_width=4, threshold=0.5,
                      tokenizer=char34, phash_token_weight=1)
    )
    workloads["img"] = (
        img_mh, img_mh.signatures(images, "image_id", "caption", phash_col="phash").cache()
    )

    for name, (mh, sigs) in workloads.items():
        sigs.count()
        k = mh.cfg.num_hashes
        t = mh.cfg.threshold
        m_sure = math.ceil(t * k / mh.cfg.band_width)
        cand = mh.sid_candidates(sigs, gate=False)
        s = sigs.select(
            F.xxhash64("id").alias("sid"),
            pack_signature_col(F.col("sig"), k).alias("psig"),
        )
        vf = (
            cand.join(s.select(F.col("sid").alias("src"), F.col("psig").alias("pa")), "src")
            .join(s.select(F.col("sid").alias("dst"), F.col("psig").alias("pb")), "dst")
            .select("m", "pa", "pb")
            .persist()
        )
        n_cand = vf.count()
        n_sure = vf.where(F.col("m") >= m_sure).count()
        print(f"{name}: n_cand={n_cand} n_sure={n_sure} ({100*n_sure/max(n_cand,1):.1f}%) m_sure={m_sure}", flush=True)
        results: dict[str, float] = {}
        counts: dict[str, int] = {}
        for rep in range(reps):
            for kname, fn in kernels(k).items():
                t0 = time.time()
                n = vf.where(
                    (F.col("m") >= m_sure) | (fn(F.col("pa"), F.col("pb")) >= t)
                ).count()
                dt = time.time() - t0
                results[kname] = min(results.get(kname, 1e9), dt)
                assert counts.setdefault(kname, n) == n
                print(f"  rep{rep} {kname:14s}: {dt:6.2f}s n={n}", flush=True)
        print(f"{name} MIN: " + str({kk: round(v, 2) for kk, v in results.items()}), flush=True)
        vf.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
