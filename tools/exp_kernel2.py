"""Round-4 experiment #2: flat-codegen verify kernel vs higher-order fold.

Higher-order functions (zip_with/aggregate/filter) are interpreted
per-element in Spark; a flat sum of N inline per-word expressions stays
inside whole-stage codegen. Same persisted verify input as exp_kernel.
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

    n_words = (k + 1) // 2

    def agg_packed(pa, pb):
        x = F.zip_with(pa, pb, lambda a, b: a.bitwiseXOR(b))
        cnt = F.aggregate(
            x, F.lit(0),
            lambda acc, w: acc
            + F.when(F.shiftrightunsigned(w, 32) == 0, 1).otherwise(0)
            + F.when(w.bitwiseAND(F.lit(0xFFFFFFFF)) == 0, 1).otherwise(0),
        )
        return (cnt - 1 if k % 2 else cnt).cast("double") / F.lit(float(k))

    def flat_sum(pa, pb):
        terms = []
        for i in range(1, n_words + 1):
            x = F.element_at(pa, i).bitwiseXOR(F.element_at(pb, i))
            terms.append(
                F.when(F.shiftrightunsigned(x, 32) == 0, 1).otherwise(0)
                + F.when(x.bitwiseAND(F.lit(0xFFFFFFFF)) == 0, 1).otherwise(0)
            )
        cnt = terms[0]
        for t in terms[1:]:
            cnt = cnt + t
        return (cnt - 1 if k % 2 else cnt).cast("double") / F.lit(float(k))

    def flat_balanced(pa, pb):
        # balanced addition tree (codegen depth log n instead of n)
        terms = []
        for i in range(1, n_words + 1):
            x = F.element_at(pa, i).bitwiseXOR(F.element_at(pb, i))
            terms.append(
                F.when(F.shiftrightunsigned(x, 32) == 0, 1).otherwise(0)
                + F.when(x.bitwiseAND(F.lit(0xFFFFFFFF)) == 0, 1).otherwise(0)
            )
        while len(terms) > 1:
            terms = [
                terms[j] + terms[j + 1] if j + 1 < len(terms) else terms[j]
                for j in range(0, len(terms), 2)
            ]
        cnt = terms[0]
        return (cnt - 1 if k % 2 else cnt).cast("double") / F.lit(float(k))

    return {"agg_packed": agg_packed, "flat_sum": flat_sum,
            "flat_balanced": flat_balanced}


def main() -> None:
    from pyspark.sql import functions as F

    from gaoya_spark.config import MinHashConfig, TokenizerSpec
    from gaoya_spark.fixtures import make_images_pdf
    from gaoya_spark.functions.similarity import pack_signature_col
    from gaoya_spark.operators.minhash_lsh import MinHashLSH
    from gaoya_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("exp_kernel2", cores=CPUS)
    char34 = TokenizerSpec(kind="char", n_from=3, n_to=4, lowercase=True)

    workloads = {}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS * 2).cache()
    docs.count()
    doc_mh = MinHashLSH(MinHashConfig(num_bands=50, band_width=4, threshold=0.5, tokenizer=char34))
    workloads["doc"] = (doc_mh, doc_mh.signatures(docs, "doc_id", "text").cache())

    images_path = f"/tmp/gaoya_bench_images_{IMAGES_N}"
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
        vf.count()
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
