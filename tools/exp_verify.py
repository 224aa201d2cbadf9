"""Round-4 experiment #4: verify-stage alternatives for the img dedup.

The verify joins dominate dedup wall (cand 2.3s vs dedup 12.1s MIN in the
same session). Variants, interleaved, per-variant MIN:
  jvm_bc    - current: two BroadcastHashJoins, flat-codegen packed kernel
  jvm_raw   - same but raw_candidates=True (no candidate agg shuffle)
  np_bc     - numpy broadcast verify: packed sig matrix as a SparkContext
              broadcast, mapInPandas gathers both rows per pair and
              counts equal positions vectorized; survivors only then
              join the sid->id map (input_hint: vectorized pandas/Arrow
              UDFs throughout)
  np_raw    - numpy verify fed by raw emissions (no agg, dedup at end)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
IMAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "100000"))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{min(3 * CPUS, 72)}g")
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from gaoya_spark.config import MinHashConfig, TokenizerSpec
    from gaoya_spark.operators.minhash_lsh import MinHashLSH
    from gaoya_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("exp_verify", cores=CPUS)
    char34 = TokenizerSpec(kind="char", n_from=3, n_to=4, lowercase=True)
    images = spark.read.parquet(f"/tmp/gaoya_bench_images_{IMAGES_N}").repartition(CPUS * 3).cache()
    images.count()
    cfg = MinHashConfig(num_bands=50, band_width=4, threshold=0.5,
                        tokenizer=char34, phash_token_weight=1)
    mh = MinHashLSH(cfg)
    sigs = mh.signatures(images, "image_id", "caption", phash_col="phash").cache()
    sigs.count()
    k = cfg.num_hashes
    t = cfg.threshold
    m_sure = math.ceil(t * k / cfg.band_width)
    need = int(math.ceil(t * k))

    # ---- numpy verify machinery (prototype)
    def np_verify(cand, with_m: bool):
        pdf = sigs.select(F.xxhash64("id").alias("sid"), "sig").toPandas()
        sids = pdf["sid"].to_numpy(dtype=np.int64)
        order = np.argsort(sids)
        sids_sorted = sids[order]
        mat = np.asarray(list(pdf["sig"]), dtype=np.uint32)[order]
        bc = spark.sparkContext.broadcast((sids_sorted, mat))

        def fn(it):
            sids_b, mat_b = bc.value
            for b in it:
                src = b["src"].to_numpy(dtype=np.int64)
                dst = b["dst"].to_numpy(dtype=np.int64)
                si = np.searchsorted(sids_b, src)
                di = np.searchsorted(sids_b, dst)
                eq = (mat_b[si] == mat_b[di]).sum(axis=1)
                keep = eq >= need
                if with_m:
                    keep |= b["m"].to_numpy(dtype=np.int64) >= m_sure
                yield pd.DataFrame({"src": src[keep], "dst": dst[keep]})

        out = cand.mapInPandas(fn, "src long, dst long")
        if not with_m:
            out = out.dropDuplicates(["src", "dst"])
        m = sigs.select(F.xxhash64("id").alias("sid"), "id")
        ma = m.select(F.col("sid").alias("src"), F.col("id").alias("src_id"))
        mb = m.select(F.col("sid").alias("dst"), F.col("id").alias("dst_id"))
        return (
            out.join(F.broadcast(ma), "src").join(F.broadcast(mb), "dst")
            .select(F.least("src_id", "dst_id").alias("src"),
                    F.greatest("src_id", "dst_id").alias("dst"))
        )

    res: dict[str, float] = {}

    def run(name, fn):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        res[name] = min(res.get(name, 1e9), dt)
        print(f"  {name:8s}: {dt:6.2f}s n={n}", flush=True)

    variants = {
        "jvm_bc": lambda: mh.dedup_pairs(sigs, keep_sim=False, broadcast_sigs=True).count(),
        "jvm_raw": lambda: mh.dedup_pairs(
            sigs, keep_sim=False, broadcast_sigs=True, raw_candidates=True
        ).count(),
        "np_bc": lambda: np_verify(mh.sid_candidates(sigs), with_m=True).count(),
        "np_raw": lambda: np_verify(
            mh.sid_candidates(sigs, aggregate=False), with_m=False
        ).count(),
    }
    for rep in range(reps):
        for name, fn in variants.items():
            run(name, fn)
    print("MIN:", {kk: round(v, 2) for kk, v in res.items()}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
