"""Stage-level profile of the dense-document dedup query (the heaviest
bench stage): how much of dedup_pairs' wall time is candidate generation
vs the signature-verify joins, and whether the verify joins broadcast.

Usage: python tools/profile_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from gaoya_spark.config import MinHashConfig, TokenizerSpec
    from gaoya_spark.operators.minhash_lsh import MinHashLSH
    from gaoya_spark.session import get_spark

    spark = get_spark("profile_dedup", cores=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS * 2).cache()
    docs.count()

    cfg = MinHashConfig(
        num_bands=50, band_width=4, threshold=0.5,
        tokenizer=TokenizerSpec(kind="char", n_from=3, n_to=4, lowercase=True),
    )
    mh = MinHashLSH(cfg)

    t0 = time.time()
    sigs = mh.signatures(docs, "doc_id", "text").cache()
    sigs.count()
    print(f"signatures: {time.time()-t0:.2f}s")

    t0 = time.time()
    cand = mh.sid_candidates(sigs)
    n_cand = cand.count()
    print(f"candidates only: {time.time()-t0:.2f}s  n={n_cand}")

    t0 = time.time()
    n = mh.dedup_pairs(sigs, keep_sim=False).count()
    print(f"full dedup (cand recomputed + verify): {time.time()-t0:.2f}s  n={n}")

    plan = mh.dedup_pairs(sigs, keep_sim=False)._jdf.queryExecution().executedPlan().toString()
    joins = [l for l in plan.splitlines() if "Join" in l or "Exchange" in l]
    print("== join/exchange nodes in the dedup plan ==")
    for l in joins:
        print(l[:160])
    spark.stop()


if __name__ == "__main__":
    main()
