"""Round-4 experiment #3: stage decomposition of the img dedup query.

Times, on the cached 100k-image signatures (interleaved, MIN of reps):
  bands     - _sid_bands materialization (count of membership rows)
  cand      - sid_candidates full (buckets groupBy + tiers + final m-agg)
  dedup_g   - full dedup_pairs keep_sim=False, gate=True (r3 default)
  dedup_ng  - same with gate=False
Prints the verify-join node types from the executed plan.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
IMAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "100000"))


def main() -> None:
    from pyspark.sql import functions as F

    from gaoya_spark.config import MinHashConfig, TokenizerSpec
    from gaoya_spark.operators.minhash_lsh import MinHashLSH
    from gaoya_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("exp_profile", cores=CPUS)
    char34 = TokenizerSpec(kind="char", n_from=3, n_to=4, lowercase=True)
    images = spark.read.parquet(f"/tmp/gaoya_bench_images_{IMAGES_N}").repartition(CPUS * 3).cache()
    images.count()
    mh = MinHashLSH(
        MinHashConfig(num_bands=50, band_width=4, threshold=0.5,
                      tokenizer=char34, phash_token_weight=1)
    )
    sigs = mh.signatures(images, "image_id", "caption", phash_col="phash").cache()
    sigs.count()

    res: dict[str, float] = {}

    def run(name, fn):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        res[name] = min(res.get(name, 1e9), dt)
        print(f"  {name:10s}: {dt:6.2f}s n={n}", flush=True)

    for rep in range(reps):
        run("bands", lambda: mh._sid_bands(sigs).count())
        run("cand", lambda: mh.sid_candidates(sigs).count())
        run("dedup_g", lambda: mh.dedup_pairs(sigs, keep_sim=False, gate=True).count())
        run("dedup_ng", lambda: mh.dedup_pairs(sigs, keep_sim=False, gate=False).count())
    print("MIN:", {k: round(v, 2) for k, v in res.items()}, flush=True)

    plan = mh.dedup_pairs(sigs, keep_sim=False)._jdf.queryExecution().executedPlan().toString()
    for l in plan.splitlines():
        if "Join" in l or "Exchange" in l:
            print(l[:150])
    spark.stop()


if __name__ == "__main__":
    main()
