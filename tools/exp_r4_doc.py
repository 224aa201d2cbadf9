"""Round-4 experiment #1: why did doc_minhash_dedup regress 16.9s -> 21.5s?

Interleaves dedup variants on the cached sf0.1 document signatures (the
dense corpus: 5k docs, ~1.2M near-dup pairs, avg band multiplicity ~11)
and reports the per-variant MIN, excluding host drift:
  cand_agg  - sid_candidates aggregated (the (src,dst) groupBy w/ m)
  cand_raw  - sid_candidates aggregate=False (raw per-band emissions)
  r2_style  - keep_sim=True, no broadcast (what round 2 benched)
  r3_bench  - keep_sim=False, broadcast_sigs=True (what round 3 benched)
  r3_nobc   - keep_sim=False, no broadcast hint
  raw_bc    - raw_candidates=True, broadcast_sigs=True

Measured (local[32], 3 interleaved reps, 2026-08-17):
  MIN: cand_agg 3.9  cand_raw 0.87  r2_style 7.81  r3_bench 8.27
       r3_nobc 7.84  raw_bc 15.57   (all n=1,204,787)
Findings: (1) the round-3 driver-bench regression (16.9 -> 21.5s) does
not reproduce at the MIN level with round-4 code — every aggregated
variant lands at ~8s, half the round-2 number, so the flat-codegen
verify kernel closed it; the 21.5s was a slow-host window (this run
itself saw r3_nobc swing 9.5s -> 133s -> 7.8s across reps — 17x drift).
(2) raw_candidates LOSES 2x on the dense doc corpus (17.6M raw
emissions vs 7.4M aggregated candidates, avg m=2.4: the extra verify
work exceeds the saved candidate-set shuffle) — it stays an img-corpus
(mostly-m=1) optimization. (3) broadcast_sigs is neutral here
(8.27 vs 7.84 ~ noise); kept for the plan-shape reason (never build a
7.4M-entry hash relation to probe with 5k rows).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from gaoya_spark.config import MinHashConfig, TokenizerSpec
    from gaoya_spark.operators.minhash_lsh import MinHashLSH
    from gaoya_spark.session import get_spark

    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{min(3 * CPUS, 72)}g")
    spark = get_spark("exp_r4_doc", cores=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS * 2).cache()
    docs.count()
    mh = MinHashLSH(
        MinHashConfig(num_bands=50, band_width=4, threshold=0.5,
                      tokenizer=TokenizerSpec(kind="char", n_from=3, n_to=4, lowercase=True))
    )
    sigs = mh.signatures(docs, "doc_id", "text").cache()
    sigs.count()

    res: dict[str, float] = {}

    def run(name, fn):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        res[name] = min(res.get(name, 1e9), dt)
        print(f"  {name:10s}: {dt:6.2f}s n={n}", flush=True)

    variants = {
        "cand_agg": lambda: mh.sid_candidates(sigs).count(),
        "cand_raw": lambda: mh.sid_candidates(sigs, aggregate=False).count(),
        "r2_style": lambda: mh.dedup_pairs(sigs).count(),
        "r3_bench": lambda: mh.dedup_pairs(sigs, keep_sim=False, broadcast_sigs=True).count(),
        "r3_nobc": lambda: mh.dedup_pairs(sigs, keep_sim=False).count(),
        "raw_bc": lambda: mh.dedup_pairs(
            sigs, keep_sim=False, broadcast_sigs=True, raw_candidates=True
        ).count(),
    }
    for rep in range(reps):
        for name, fn in variants.items():
            run(name, fn)
    print("MIN:", {k: round(v, 2) for k, v in res.items()}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
