"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...}

--scaling: re-runs the same workload in subprocesses at local[2] and
local[8] (the sandbox stand-in for N -> 4N executors, BASELINE.md; this
host has ~16 physical cores, see run_scaling docstring) and writes
BENCH/BASELINE.md with throughput at both plus scaling efficiency.
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

# pin BLAS to one thread per worker: otherwise numpy inside the pandas-UDF
# workers of the smaller run borrows the idle cores, corrupting the
# N -> 4N scaling comparison
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def _force(df):
    """Materialize a DataFrame fully: aggregate over EVERY column so
    Catalyst cannot prune any of them. Referencing only the first column
    was a measurement bug (caught round 5): on the uncached simhash
    stage the plan dropped the signature UDF entirely — the id-only
    aggregate ran in 0.79s where the real computation takes 6.6s
    (EXPERIMENTS.md ledger). Cached frames were unaffected (the columnar
    cache materializes the full cached plan), which is why the minhash
    stages measured correctly."""
    from pyspark.sql import functions as F

    cols = df.columns
    return df.agg(F.count("*"), *[F.max(c) for c in cols]).collect()[0][0]


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

    # small parquet files coalesce to 1-4 input splits under the default
    # 128MB maxPartitionBytes, starving the UDF stages of parallelism —
    # spread rows across the cores explicitly (at real scale, file count
    # and maxPartitionBytes do this naturally)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS * 2).cache()
    n_docs = docs.count()

    char34 = TokenizerSpec(kind="char", n_from=3, n_to=4, lowercase=True)
    word = TokenizerSpec(kind="word", n_from=1, n_to=1, lowercase=True)
    # 50 bands x 4 rows @ threshold 0.5 = the reference's own benchmark
    # config (BASELINE.md: scholarly-dedup notebook). Band width 4 keeps the
    # false-positive candidate rate ~10x below width 3 at borderline sims —
    # the difference between linear and quadratic candidate growth.
    mh_cfg = MinHashConfig(num_bands=50, band_width=4, threshold=0.5, tokenizer=char34)
    sh_cfg = SimHashConfig(nbits=64, num_blocks=8, max_distance=4, tokenizer=word)

    mh = MinHashLSH(mh_cfg)
    sh = SimHashLSH(sh_cfg)

    # synthetic images table at bench scale (captions+phash; bytes pruned in
    # the real pipeline anyway) — generated once to a shared parquet cache so
    # driver-side generation cost never pollutes the (distributed) timings
    images_path = f"/tmp/gaoya_bench_images_{IMAGES_N}"
    if not os.path.exists(os.path.join(images_path, "_SUCCESS")):
        images_pdf, _ = make_images_pdf(IMAGES_N, seed=42, dup_frac=0.2, with_bytes=False)
        spark.createDataFrame(
            images_pdf[["image_id", "caption", "phash"]]
        ).repartition(64).write.mode("overwrite").parquet(images_path)
    images = spark.read.parquet(images_path).repartition(CPUS * 3).cache()
    images.count()

    state = {}

    def q_doc_minhash_signatures():
        sigs = mh.signatures(docs, "doc_id", "text")
        state["doc_sigs"] = sigs.cache()
        return _force(state["doc_sigs"])

    def q_doc_minhash_dedup():
        # numpy_verify, aggregated: with ids attached inside the kernel,
        # aggregated mode is verify+attach in ONE pandas pass with no
        # post-kernel exchange, and the candidate aggregation collapses
        # this dense corpus's 17.6M raw emissions (avg m=2.4) to 7.4M
        # candidates before the kernel. Interleaved MINs on this corpus:
        # agg 6.1s vs raw 27.4s vs JVM broadcast-join verify 15.6s
        # (tools/exp_np_agg.py). Small-table gated like broadcast_sigs —
        # at 10^12 rows the default shuffle verify path applies.
        return state["doc_sigs"] and mh.dedup_pairs(
            state["doc_sigs"], keep_sim=False, numpy_verify=True,
        ).count()

    def q_doc_simhash_dedup():
        sigs = sh.signatures(docs, "doc_id", "text")
        return sh.dedup_pairs(sigs).count()

    def q_doc_substring():
        return substring_pairs(docs, "doc_id", "text", min_len=24).count()

    def q_img_minhash_signatures():
        # the doc-stage caches are dead weight from here on — release them
        # so the image stages (the memory-heavy half of the suite) get the
        # full storage pool instead of evicting against them
        docs.unpersist()
        if "doc_sigs" in state:
            state["doc_sigs"].unpersist()
        img_mh = MinHashLSH(
            MinHashConfig(num_bands=50, band_width=4, threshold=0.5,
                          tokenizer=char34, phash_token_weight=1)
        )
        sigs = img_mh.signatures(images, "image_id", "caption", phash_col="phash")
        state["img_sigs"] = sigs.cache()
        state["img_mh"] = img_mh
        return _force(state["img_sigs"])

    def q_img_minhash_dedup():
        # numpy_verify, aggregated: verify + in-kernel id attach in one
        # pandas pass, m-band prefilter skips the matrix gather for pairs
        # already above threshold by band count. Interleaved MINs: agg
        # 6.51s ~ raw 6.58s on this mostly-m=1 corpus (tools/exp_np_agg.py),
        # and 1.6x the JVM broadcast-join verify; counts identical
        state["img_pairs"] = (
            state["img_mh"]
            .dedup_pairs(state["img_sigs"], keep_sim=False, numpy_verify=True)
            .select("src", "dst")
            .cache()
        )
        return state["img_pairs"].count()

    def q_img_simhash_signatures():
        img_sh = SimHashLSH(
            SimHashConfig(nbits=64, num_blocks=8, max_distance=4,
                          tokenizer=word, phash_vote_weight=2)
        )
        sigs = img_sh.signatures(images, "image_id", "caption", phash_col="phash")
        return _force(sigs.select("id", "sig"))

    def q_img_components():
        labels = connected_components(state["img_pairs"], max_iter=20)
        return labels.count()

    def q_img_components_distributed():
        # driver_threshold=0 forces the iterative label-propagation path —
        # the 10^12-row strategy — so its scaling is measured, not asserted
        labels = connected_components(
            state["img_pairs"], max_iter=20, driver_threshold=0
        )
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
        "img_components_distributed": q_img_components_distributed,
    }, n_docs


def _total_ram_gb() -> float:
    """Physical RAM in GiB (MemTotal) — caps the driver-heap default so a
    high-core/low-RAM host doesn't get a heap the box can't back."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return 64.0


def _converged(samples: dict[str, list[float]], rel: float, abs_floor: float) -> bool:
    """True when, for EVERY query, the two best timings agree within
    rel (or abs_floor seconds for sub-second stages, where scheduler
    jitter dominates and relative spread is meaningless) AND the latest
    rep did not set a new minimum by >5% — a rep that still improves the
    best means JVM/JIT/page-cache warming is still under way and the
    plateau has not been reached (measured: dedup falling 6.0 -> 5.8 ->
    4.8 across reps while the two-best rule would already have stopped)."""
    for ts in samples.values():
        if len(ts) < 2:
            return False
        best, second = sorted(ts)[:2]
        if (second - best) > max(rel * best, abs_floor):
            return False
        if ts[-1] == best and (second - best) > max(0.05 * best, 0.1):
            return False
    return True


def run_once() -> dict:
    """One bench process: the full query suite, repeated cold (caches
    cleared and fixtures re-materialized between reps), reporting the
    per-query MIN plus per-query `spread` = (2nd_best - best) / best.

    Reps are ADAPTIVE: at least $SPARK_GRAFT_BENCH_REPS (default 2), then
    keep repeating until every query's two best timings agree within 20%
    (or 0.4s for sub-second stages), capped at 6. Rationale: this host's
    throughput drifts up to ~3.4x across minutes (round 4's scoreboard
    showed 25.7s for a query an immediate re-run measured at 7.65s); a
    fixed rep count caught in a slow window still misleads, while
    repeat-until-agreement bounds the error the artifact can carry — and
    the spread column makes residual noise visible to the reader."""
    from gaoya_spark.session import get_spark

    # size the heap with parallelism like run_scaling's subprocesses do
    # (3g/core ~ a normal executor memory/core ratio): the suite holds the
    # doc+image inputs, two signature tables, and the bands cache live at
    # once, and at local[32] the old 8g default ran the verify joins
    # GC-bound (GCLocker retry warnings, 13-19s img dedup vs 8-9s for the
    # identical query in a roomy heap). Clamped to 80% of physical RAM so
    # a high-core/low-RAM host can still start the JVM.
    mem_gb = max(2, min(3 * CPUS, 72, int(0.8 * _total_ram_gb())))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{mem_gb}g")
    spark = get_spark("gaoya_spark_bench", cores=CPUS)
    min_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    if "SPARK_GRAFT_BENCH_MAX_REPS" in os.environ:
        max_reps = max(min_reps, int(os.environ["SPARK_GRAFT_BENCH_MAX_REPS"]))
    elif "SPARK_GRAFT_BENCH_REPS" in os.environ:
        # an explicit rep count means EXACT count (run_scaling /
        # run_hw_control interleave their own repeats across subprocesses
        # and aggregate outside; inner adaptation would double-count)
        max_reps = min_reps
    else:
        max_reps = 6
    only = os.environ.get("SPARK_GRAFT_ONLY")
    samples: dict[str, list[float]] = {}
    counts: dict = {}
    for rep in range(max_reps):
        if rep >= min_reps and _converged(samples, rel=0.20, abs_floor=0.4):
            break
        spark.catalog.clearCache()
        queries, n_docs = build_queries(spark)
        if only:
            keep = {q.strip() for q in only.split(",")}
            unknown = keep - queries.keys()
            if unknown:
                raise SystemExit(
                    f"SPARK_GRAFT_ONLY names not in bench queries: {sorted(unknown)}"
                )
            queries = {k: v for k, v in queries.items() if k in keep}
        for name, fn in queries.items():
            t0 = time.time()
            c = fn()
            dt = round(time.time() - t0, 3)
            if name in counts:
                assert counts[name] == c, f"{name}: count drifted across reps"
            counts[name] = c
            samples.setdefault(name, []).append(dt)
    timings = {q: min(ts) for q, ts in samples.items()}
    spread = {
        q: round((sorted(ts)[1] - sorted(ts)[0]) / sorted(ts)[0], 3)
        if len(ts) > 1 and sorted(ts)[0] > 0 else 0.0
        for q, ts in samples.items()
    }
    total = round(sum(timings.values()), 3)
    sig_sec = timings.get("img_minhash_signatures")
    result = {
        "metric": "near-dup dedup pipeline wall time (signatures+LSH+CC), local[%d]" % CPUS,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "reps": len(next(iter(samples.values()))) if samples else 0,
        "counts": counts,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "images_n": IMAGES_N,
        "signatures_per_sec": round(IMAGES_N / sig_sec, 1) if sig_sec else None,
    }
    spark.stop()
    return result


def _analysis_notes(results: dict) -> str:
    q2, q8 = results[2]["queries"], results[8]["queries"]

    def eff(name):
        return (q2[name] / q8[name]) / 4 if q8[name] else float("nan")

    return (
        "\n## Per-stage scaling analysis\n\n"
        "| stage | local[2] | local[8] | efficiency |\n|---|---|---|---|\n"
        f"| img_minhash_signatures (the north 'signatures/sec' stage) | "
        f"{q2['img_minhash_signatures']}s | {q8['img_minhash_signatures']}s | "
        f"{eff('img_minhash_signatures'):.2f} |\n"
        f"| img_minhash_dedup (band join + verify) | {q2['img_minhash_dedup']}s | "
        f"{q8['img_minhash_dedup']}s | {eff('img_minhash_dedup'):.2f} |\n"
        f"| img_components (union-find fast path, driver-bound by design) | "
        f"{q2['img_components']}s | {q8['img_components']}s | n/a (sub-3s) |\n"
        f"| img_components_distributed (label propagation forced, the 10^12-row path) | "
        f"{q2['img_components_distributed']}s | {q8['img_components_distributed']}s | "
        f"{eff('img_components_distributed'):.2f} |\n\n"
        "Notes on honesty of the stand-in:\n"
        "- Host constraints measured before choosing levels: 32 OS-threads\n"
        "  deliver only ~24 cores of compute (SMT); pure-CPU multiprocess\n"
        "  scaling is 8.0x at 8 procs. Host throughput also drifts up to\n"
        "  ~50% across minutes (same kernel measured 4.5s and 22s an hour\n"
        "  apart), hence interleaved repeats + per-query min.\n"
        "- The dedup stage is shuffle-bound on a single box where all\n"
        "  'executors' share one memory bus; on a real cluster shuffle\n"
        "  bandwidth scales with executor count.\n"
        "- A ratio-only 'optimization' (dropping the bands cache) improved\n"
        "  measured efficiency to 0.84 but made BOTH absolute times worse;\n"
        "  it was rejected. The committed configuration is the fastest\n"
        "  absolute at every level measured.\n"
        "- Workload sized so every heavy img stage is well over 30s at the\n"
        "  narrow level (round-5: IMAGES_N=400k), amortizing scheduler +\n"
        "  python-worker warmup latency that dominated the 3-22s stages of\n"
        "  earlier rounds' 100k runs. Order-of-magnitude stress results\n"
        "  (1M images: recall, streaming replay, pathology drop-cap) live\n"
        "  in BENCH/STRESS_1M.md.\n"
    )


def run_scaling() -> None:
    """Same workload at local[2] and local[8]; efficiency = (T_2/T_8)/4.

    2 and 8 (not 8/32) because this host has ~16 physical cores + SMT: 32
    OS-threads deliver only ~24 cores' worth of compute (measured), so
    8->32 has a hardware ceiling of ~0.76 regardless of the engine; and a
    wide run on a shared box contends for DRAM bandwidth. 2->8 keeps both
    levels well inside physical capacity — the honest stand-in for adding
    executors, where capacity (cores AND memory bandwidth) genuinely
    quadruples. Levels are interleaved and min-aggregated because host
    throughput drifts +-50% across minutes (measured)."""
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    runs: dict[int, list[dict]] = {2: [], 8: []}
    # interleave levels (4,16,4,16,...) so slow drift in host capacity
    # cancels instead of biasing whichever level runs last
    for _ in range(repeats):
        for cpus in (2, 8):
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cpus),
                # scaling interleaves its own repeats across subprocesses;
                # inner repetition would just double every run
                SPARK_GRAFT_BENCH_REPS="1",
                # memory scales with parallelism, as adding executors does on
                # a real cluster (a fixed heap makes the wide run GC-bound);
                # 3g/core ~ a normal executor memory/core ratio and keeps the
                # narrow run from thrashing its cache pool at 200k+ rows
                SPARK_GRAFT_DRIVER_MEM=f"{int(cpus * 3)}g",
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            runs[cpus].append(r)
            print(f"local[{cpus}]: {r['value']}s", file=sys.stderr)

    def min_agg(rs: list[dict]) -> dict:
        # per-query minimum across repeats = the least-noise estimate of
        # each stage's true cost at that parallelism
        out = dict(rs[0])
        out["queries"] = {
            q: min(r["queries"][q] for r in rs) for q in rs[0]["queries"]
        }
        out["spread"] = {
            q: round((ts[1] - ts[0]) / ts[0], 3) if len(ts) > 1 and ts[0] > 0 else 0.0
            for q in rs[0]["queries"]
            for ts in [sorted(r["queries"][q] for r in rs)]
        }
        out["value"] = round(sum(out["queries"].values()), 3)
        sig = out["queries"]["img_minhash_signatures"]
        out["signatures_per_sec"] = round(out["images_n"] / sig, 1) if sig else None
        return out

    results = {2: min_agg(runs[2]), 8: min_agg(runs[8])}
    t_lo, t_hi = results[2]["value"], results[8]["value"]
    speedup = t_lo / t_hi
    eff = speedup / 4
    # headline efficiency over the 100k-image pipeline stages (the tiny
    # sf0.1 doc queries are scheduling-latency-bound and pure noise for a
    # throughput-scaling claim)
    img_q = [q for q in results[8]["queries"] if q.startswith("img_")]
    i_lo = sum(results[2]["queries"][q] for q in img_q)
    i_hi = sum(results[8]["queries"][q] for q in img_q)
    img_eff = (i_lo / i_hi) / 4
    sig_lo = results[2]["signatures_per_sec"]
    sig_hi = results[8]["signatures_per_sec"]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — scaling evidence (sandbox stand-in for N -> 4N executors)\n\n"
            "Same workload, same input, two parallelism levels (BASELINE.md\n"
            "sandbox note): the full bench suite (document + synthetic-image\n"
            f"dedup, {IMAGES_N} images, sf={results[8]['sf']}).\n\n"
            "| parallelism | total wall (s) | minhash signatures/s |\n|---|---|---|\n"
            f"| local[2] | {t_lo} | {sig_lo} |\n"
            f"| local[8] | {t_hi} | {sig_hi} |\n\n"
            f"- speedup 2 -> 8 cores (4x): **{speedup:.2f}x** over the full suite\n"
            f"- full-suite scaling efficiency = speedup / 4 = **{eff:.3f}**\n"
            f"- {IMAGES_N // 1000}k-image pipeline stages only (img_*): "
            f"{round(i_lo,3)}s -> {round(i_hi,3)}s, "
            f"efficiency **{img_eff:.3f}** (target >= 0.8 per north rule; the "
            "sf0.1 document queries are seconds-scale and latency-bound, so "
            "they dilute the throughput signal)\n\n"
            "Per-query seconds:\n\n| query | local[2] | local[8] |\n|---|---|---|\n"
            + "\n".join(
                f"| {q} | {results[2]['queries'][q]} | {results[8]['queries'][q]} |"
                for q in results[8]["queries"]
            )
            + "\n"
            + _analysis_notes(results)
        )
    print(json.dumps({
        "scaling_efficiency": round(eff, 3),
        "img_pipeline_efficiency": round(img_eff, 3),
        "t2": t_lo, "t8": t_hi, "img_t2": round(i_lo, 3), "img_t8": round(i_hi, 3),
    }))


def run_hw_control() -> None:
    """Hardware-ceiling control for the scaling artifact: the same
    img-dedup workload run as 1 process at local[2] (T1) vs 4 CONCURRENT
    INDEPENDENT processes at local[2] each (T4) — zero cross-process
    shuffles or shared Spark state, so 4x aggregate throughput (T4 == T1)
    is exactly what the HARDWARE allows when 2 -> 8 cores are engaged.
    hw_efficiency = T1 / T4 bounds any in-engine 2 -> 8 scaling number on
    this box: a stage matching it is scaling as well as independent
    processes can."""
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="2",
        SPARK_GRAFT_DRIVER_MEM="6g",
        SPARK_GRAFT_ONLY="img_minhash_signatures,img_minhash_dedup",
        SPARK_GRAFT_BENCH_REPS="1",  # wall time of the whole process is the metric
    )

    def launch():
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )

    # warm the shared image fixture cache first so no run pays generation
    subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                   capture_output=True, timeout=3600)
    t0 = time.time()
    p = launch(); p.wait()
    t1 = time.time() - t0
    t0 = time.time()
    procs = [launch() for _ in range(4)]
    for p in procs:
        p.wait()
    t4 = time.time() - t0
    print(json.dumps({
        "t_single_local2": round(t1, 3),
        "t_4x_concurrent_local2": round(t4, 3),
        "hw_ceiling_efficiency": round(t1 / t4, 3),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--hwcontrol" in sys.argv:
        run_hw_control()
    else:
        print(json.dumps(run_once()))
