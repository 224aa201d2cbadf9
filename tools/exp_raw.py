"""A/B: aggregated candidates + m-prefilter vs raw_candidates (no
candidate-set shuffle, verify-all, dedup survivors) on the bench dedup
queries. Interleaved reps, per-variant MIN, counts asserted equal."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{min(3 * CPUS, 72)}g")

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def main():
    from gaoya_spark.config import MinHashConfig, TokenizerSpec
    from gaoya_spark.fixtures import make_images_pdf
    from gaoya_spark.operators.minhash_lsh import MinHashLSH
    from gaoya_spark.session import get_spark

    spark = get_spark("exp_raw", cores=CPUS)
    char34 = TokenizerSpec(kind="char", n_from=3, n_to=4, lowercase=True)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS * 2).cache()
    docs.count()
    images_path = "/tmp/gaoya_bench_images_100000"
    images = spark.read.parquet(images_path).repartition(CPUS * 3).cache()
    images.count()

    mh_doc = MinHashLSH(MinHashConfig(num_bands=50, band_width=4, threshold=0.5, tokenizer=char34))
    mh_img = MinHashLSH(
        MinHashConfig(num_bands=50, band_width=4, threshold=0.5, tokenizer=char34, phash_token_weight=1)
    )
    doc_sigs = mh_doc.signatures(docs, "doc_id", "text").cache()
    doc_sigs.count()
    img_sigs = mh_img.signatures(images, "image_id", "caption", phash_col="phash").cache()
    img_sigs.count()

    variants = {
        "agg": dict(keep_sim=False, broadcast_sigs=True),
        "raw": dict(keep_sim=False, broadcast_sigs=True, raw_candidates=True),
    }
    counts: dict = {}
    best: dict = {}
    for rep in range(3):
        for vname, vkw in variants.items():
            for cname, (mh, sigs) in {
                "doc": (mh_doc, doc_sigs), "img": (mh_img, img_sigs)
            }.items():
                t0 = time.time()
                n = mh.dedup_pairs(sigs, **vkw).count()
                dt = time.time() - t0
                key = (vname, cname)
                counts.setdefault(cname, set()).add(n)
                best[key] = min(best.get(key, 1e9), dt)
                print(f"rep{rep} {vname:4s} {cname}: {dt:7.2f}s n={n}", flush=True)
    print("MIN:", {f"{v}/{c}": round(t, 2) for (v, c), t in sorted(best.items())})
    for cname, ns in counts.items():
        assert len(ns) == 1, f"{cname}: counts diverged {ns}"
    print("counts identical per corpus:", {c: ns.pop() for c, ns in counts.items()})
    spark.stop()


if __name__ == "__main__":
    main()
