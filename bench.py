"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...}

--scaling: re-runs the same workload in subprocesses at local[8] and
local[32] (the sandbox stand-in for N -> 4N executors, BASELINE.md) and
writes BENCH/BASELINE.md with throughput at both plus scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
IMAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "100000"))


def _force(df):
    """Materialize a DataFrame fully (count alone can let Catalyst prune
    UDF-computed columns)."""
    from pyspark.sql import functions as F

    cols = df.columns
    return df.agg(F.count("*"), *[F.max(c) for c in cols[:1]]).collect()[0][0]


def build_queries(spark):
    """name -> zero-arg callable returning row count. Uses the engine's fast
    path (FNV + gaoya formula) — the oracle configs are for correctness."""
    from pyspark.sql import functions as F

    from gaoya_spark.config import MinHashConfig, SimHashConfig, TokenizerSpec
    from gaoya_spark.fixtures import make_images_pdf
    from gaoya_spark.operators.cluster import connected_components
    from gaoya_spark.operators.minhash_lsh import MinHashLSH
    from gaoya_spark.operators.simhash_lsh import SimHashLSH
    from gaoya_spark.operators.substring import substring_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    n_docs = docs.count()

    char34 = TokenizerSpec(kind="char", n_from=3, n_to=4, lowercase=True)
    word = TokenizerSpec(kind="word", n_from=1, n_to=1, lowercase=True)
    mh_cfg = MinHashConfig(num_bands=42, band_width=3, threshold=0.7, tokenizer=char34)
    sh_cfg = SimHashConfig(nbits=64, num_blocks=8, max_distance=4, tokenizer=word)

    mh = MinHashLSH(mh_cfg)
    sh = SimHashLSH(sh_cfg)

    # synthetic images table at bench scale (captions+phash; bytes pruned in
    # the real pipeline anyway) — generated once, deterministic seed
    images_pdf, _ = make_images_pdf(IMAGES_N, seed=42, dup_frac=0.2, with_bytes=False)
    images = (
        spark.createDataFrame(images_pdf[["image_id", "caption", "phash"]])
        .repartition(CPUS * 2)
        .cache()
    )
    images.count()

    state = {}

    def q_doc_minhash_signatures():
        sigs = mh.signatures(docs, "doc_id", "text")
        state["doc_sigs"] = sigs.cache()
        return _force(state["doc_sigs"])

    def q_doc_minhash_dedup():
        return state["doc_sigs"] and mh.dedup_pairs(state["doc_sigs"]).count()

    def q_doc_simhash_dedup():
        sigs = sh.signatures(docs, "doc_id", "text")
        return sh.dedup_pairs(sigs).count()

    def q_doc_substring():
        return substring_pairs(docs, "doc_id", "text", min_len=24).count()

    def q_img_minhash_signatures():
        img_mh = MinHashLSH(
            MinHashConfig(num_bands=42, band_width=3, threshold=0.5,
                          tokenizer=char34, phash_token_weight=1)
        )
        sigs = img_mh.signatures(images, "image_id", "caption", phash_col="phash")
        state["img_sigs"] = sigs.cache()
        state["img_mh"] = img_mh
        return _force(state["img_sigs"])

    def q_img_minhash_dedup():
        return state["img_mh"].dedup_pairs(state["img_sigs"]).count()

    def q_img_simhash_signatures():
        img_sh = SimHashLSH(
            SimHashConfig(nbits=64, num_blocks=8, max_distance=4,
                          tokenizer=word, phash_vote_weight=2)
        )
        sigs = img_sh.signatures(images, "image_id", "caption", phash_col="phash")
        return _force(sigs.select("id", "sig"))

    def q_img_components():
        pairs = state["img_mh"].dedup_pairs(state["img_sigs"]).select("src", "dst")
        labels = connected_components(pairs, max_iter=20)
        return labels.count()

    return {
        "doc_minhash_signatures": q_doc_minhash_signatures,
        "doc_minhash_dedup": q_doc_minhash_dedup,
        "doc_simhash_dedup": q_doc_simhash_dedup,
        "doc_substring": q_doc_substring,
        "img_minhash_signatures": q_img_minhash_signatures,
        "img_minhash_dedup": q_img_minhash_dedup,
        "img_simhash_signatures": q_img_simhash_signatures,
        "img_components": q_img_components,
    }, n_docs


def run_once() -> dict:
    from gaoya_spark.session import get_spark

    spark = get_spark("gaoya_spark_bench", cores=CPUS)
    t_start = time.time()
    queries, n_docs = build_queries(spark)
    timings = {}
    counts = {}
    for name, fn in queries.items():
        t0 = time.time()
        counts[name] = fn()
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_start, 3)
    sig_rows = IMAGES_N
    sig_sec = timings["img_minhash_signatures"]
    result = {
        "metric": "near-dup dedup pipeline wall time (signatures+LSH+CC), local[%d]" % CPUS,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "counts": counts,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "images_n": IMAGES_N,
        "signatures_per_sec": round(sig_rows / sig_sec, 1) if sig_sec else None,
    }
    spark.stop()
    return result


def run_scaling() -> None:
    """Same workload at local[8] and local[32]; efficiency =
    (T_8 / T_32) / (32/8). Writes BENCH/BASELINE.md."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(f"local[{cpus}]: {results[cpus]['value']}s", file=sys.stderr)
    t8, t32 = results[8]["value"], results[32]["value"]
    speedup = t8 / t32
    eff = speedup / (32 / 8)
    sig8 = results[8]["signatures_per_sec"]
    sig32 = results[32]["signatures_per_sec"]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — scaling evidence (sandbox stand-in for N -> 4N executors)\n\n"
            "Same workload, same input, two parallelism levels (BASELINE.md\n"
            "sandbox note): the full bench suite (document + synthetic-image\n"
            f"dedup, {IMAGES_N} images, sf={results[32]['sf']}).\n\n"
            "| parallelism | total wall (s) | minhash signatures/s |\n|---|---|---|\n"
            f"| local[8]  | {t8} | {sig8} |\n"
            f"| local[32] | {t32} | {sig32} |\n\n"
            f"- speedup 8 -> 32 cores (4x): **{speedup:.2f}x**\n"
            f"- scaling efficiency = speedup / 4 = **{eff:.3f}** "
            f"(target >= 0.8 per north rule)\n\n"
            "Per-query seconds:\n\n| query | local[8] | local[32] |\n|---|---|---|\n"
            + "\n".join(
                f"| {q} | {results[8]['queries'][q]} | {results[32]['queries'][q]} |"
                for q in results[32]["queries"]
            )
            + "\n"
        )
    print(json.dumps({"scaling_efficiency": round(eff, 3), "t8": t8, "t32": t32}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_once()))
