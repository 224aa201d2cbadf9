"""SimHash Hamming-ball LSH as DataFrame dataflow.

The reference splits the signature's bits into `num_blocks` blocks and
keeps one hash table per combination of (num_blocks - max_distance) blocks
(/root/reference/gaoya/src/simhash/sim_hash_index.rs:95-128, mask
enumeration at permutation.rs:78-106). Pigeonhole: two signatures within
Hamming distance d differ in at most d blocks, so they match exactly on at
least (num_blocks - d) blocks — i.e. on at least one enumerated mask —
giving recall 1.0 for d-balls before the exact distance filter.

Spark realization: masks are enumerated on the driver
(itertools.combinations); each signature explodes into one row per mask
(table_idx, sig & mask); candidates come from the equi-join on that pair;
the exact filter is bit_count(xor) < max_distance — STRICT '<', mirroring
Q8 (sim_hash_index.rs:57; the python docstring says <= — the reference
code wins, divergence documented).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window, functions as F

from gaoya_spark.config import SimHashConfig
from gaoya_spark.functions.signatures import make_simhash_udf, make_simhash_tokens_udf
from gaoya_spark.functions.similarity import hamming_distance_col


def _block_masks(nbits: int, num_blocks: int, max_distance: int) -> list[int]:
    """One mask per combination of (num_blocks - max_distance) blocks.

    Blocks split nbits as evenly as possible (first `nbits % num_blocks`
    blocks get one extra bit), mirroring the reference's block layout.
    """
    base = nbits // num_blocks
    rem = nbits % num_blocks
    blocks = []
    start = 0
    for i in range(num_blocks):
        width = base + (1 if i < rem else 0)
        mask = ((1 << width) - 1) << start
        blocks.append(mask)
        start += width
    keep = num_blocks - max_distance
    masks = []
    for combo in combinations(range(num_blocks), keep):
        m = 0
        for i in combo:
            m |= blocks[i]
        masks.append(m)
    return masks


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


class SimHashLSH:
    def __init__(self, cfg: SimHashConfig | None = None):
        self.cfg = cfg or SimHashConfig()
        self.masks = _block_masks(cfg.nbits if cfg else 64,
                                  self.cfg.num_blocks, self.cfg.max_distance)

    # ------------------------------------------------------------------ sigs
    def signatures(
        self,
        df: DataFrame,
        id_col: str = "id",
        text_col: str = "text",
        phash_col: str | None = None,
        tokens_col: str | None = None,
    ) -> DataFrame:
        if tokens_col is not None:
            udf = make_simhash_tokens_udf(self.cfg)
            sig = udf(F.col(tokens_col))
        elif phash_col is not None:
            udf = make_simhash_udf(self.cfg, with_phash=True)
            sig = udf(F.col(text_col), F.col(phash_col))
        else:
            udf = make_simhash_udf(self.cfg)
            sig = udf(F.col(text_col))
        return df.select(F.col(id_col).alias("id"), sig.alias("sig"))

    # ---------------------------------------------------------------- tables
    @property
    def _wide(self) -> bool:
        return self.cfg.nbits == 128

    def _mask_words(self) -> list[tuple[int, int]]:
        """Each mask as (lo, hi) signed 64-bit words (hi = 0 for <=64)."""
        return [
            (_to_i64(m & ((1 << 64) - 1)), _to_i64(m >> 64)) for m in self.masks
        ]

    def _dist(self, a, b):
        """Hamming distance between two signatures (long, or 2-word array)."""
        if self._wide:
            return hamming_distance_col(a[0], b[0]) + hamming_distance_col(a[1], b[1])
        return hamming_distance_col(a, b)

    def tables(self, sig_df: DataFrame, id_col: str = "id") -> DataFrame:
        """(id, table_idx, key): key = sig & mask per enumerated mask —
        the Hamming-ball bucketing, fully JVM-side. For 128-bit signatures
        the key is xxhash64 of both masked words (an 8-byte key either way;
        cross-key collisions only add candidates, removed by the exact
        distance filter)."""
        if self._wide:
            keys = F.array(*[
                F.xxhash64(
                    F.col("sig")[0].bitwiseAND(F.lit(lo)),
                    F.col("sig")[1].bitwiseAND(F.lit(hi)),
                )
                for lo, hi in self._mask_words()
            ])
        else:
            mask_arr = F.array(*[F.lit(_to_i64(m)) for m in self.masks])
            keys = F.transform(mask_arr, lambda m: F.col("sig").bitwiseAND(m))
        return sig_df.select(
            F.col(id_col).alias("id"),
            F.col("sig"),
            F.posexplode(keys).alias("table_idx", "key"),
        ).select("id", "table_idx", "key")

    # ----------------------------------------------------------- dedup pairs
    def _sid_tables(self, sig_df: DataFrame, raw_id: bool = False) -> DataFrame:
        """(sid, sig, tk): 8-byte id surrogate, the 8-byte signature itself,
        and one 8-byte table key per enumerated mask (tk = xxhash64 of the
        masked signature seeded by the table index — one long key instead of
        (table_idx, key), exactly like the MinHash band key; a cross-table
        collision only adds a candidate, and candidates are distance-checked
        exactly). raw_id=True uses the id column itself as sid (valid only
        for 64-bit integer ids — lets dedup_pairs skip the sid->id attach
        joins entirely)."""
        if self._wide:
            keys = F.array(*[
                F.xxhash64(
                    F.col("sig")[0].bitwiseAND(F.lit(lo)),
                    F.col("sig")[1].bitwiseAND(F.lit(hi)),
                    F.lit(i),
                )
                for i, (lo, hi) in enumerate(self._mask_words())
            ])
        else:
            keys = F.array(*[
                F.xxhash64(F.col("sig").bitwiseAND(F.lit(_to_i64(m))), F.lit(i))
                for i, m in enumerate(self.masks)
            ])
        sid = F.col("id") if raw_id else F.xxhash64("id")
        return sig_df.select(
            sid.alias("sid"), "sig", F.explode(keys).alias("tk")
        )

    def _sid_dist_pairs(
        self,
        sig_df: DataFrame,
        max_bucket_size: int = 4096,
        array_bucket_limit: int = 512,
        block_groups: int = 16,
        max_distance: int | None = None,
        persist: bool = True,
        gate: bool = False,
        raw_id: bool = False,
    ) -> DataFrame:
        """(src, dst, dist) in sid space, deduped across tables. The 8-byte
        signature rides inside the bucket arrays, so the Hamming distance is
        computed map-side during pair generation and (when max_distance is
        given) candidates are filtered BEFORE the dedup shuffle — the only
        wide exchange carries surviving pairs. Buckets <= array_bucket_limit
        expand via JVM array combinatorics; (array_bucket_limit,
        max_bucket_size] fall back to the triangle-block join; larger
        buckets (the all-empty-caption pathology at web scale) are excluded
        — bucket_stats(max_bucket_size=...) records how many."""
        buckets = (
            self._sid_tables(sig_df, raw_id=raw_id)
            .groupBy("tk")
            .agg(F.array_sort(F.collect_list(F.struct("sid", "sig"))).alias("ms"))
            .where(F.size("ms") >= 2)
            # identical member sets recur across tables for tight families —
            # generate each distinct set's pairs once (no multiplicity
            # needed here: the output is a distinct pair set, not a count)
            .select("ms")
            .distinct()
        )
        if persist:
            buckets = buckets.persist()
        ms = F.col("ms")
        pair_structs = F.flatten(
            F.transform(
                ms,
                lambda x, i: F.transform(
                    F.slice(ms, i + 2, F.size(ms)),
                    lambda y: F.struct(
                        x["sid"].alias("src"),
                        y["sid"].alias("dst"),
                        x["sig"].alias("sig_a"),
                        y["sig"].alias("sig_b"),
                    ),
                ),
            )
        )
        raw = (
            buckets.where(F.size("ms") <= array_bucket_limit)
            .select(F.explode(pair_structs).alias("p"))
            .select(
                "p.src", "p.dst",
                self._dist(F.col("p.sig_a"), F.col("p.sig_b")).alias("dist"),
            )
        )
        # gate=True prunes the triangle tier with a blocking probe job;
        # default keeps the tier in the plan — same measured trade as
        # _bucket_pairs (an empty AQE stage is cheaper than serializing
        # the pipeline on a gate collect)
        has_big = (not gate) or (not persist) or (
            buckets.where(F.size("ms") > array_bucket_limit).limit(1).count() > 0
        )
        if has_big:
            mid = buckets.where(
                (F.size("ms") > array_bucket_limit) & (F.size("ms") <= max_bucket_size)
            ).select(
                F.xxhash64("ms").alias("hb"), F.explode("ms").alias("m")
            ).select(
                "hb", F.col("m.sid").alias("sid"), F.col("m.sig").alias("sig")
            )
            g = F.pmod(F.xxhash64("sid", F.lit(0x5A17)), F.lit(block_groups))
            mid_g = mid.withColumn("g", g)
            left = mid_g.withColumn(
                "g2", F.explode(F.sequence(F.col("g"), F.lit(block_groups - 1)))
            ).select(
                "hb", F.col("sid").alias("lid"), F.col("sig").alias("lsig"),
                F.col("g").alias("g1"), "g2",
            )
            right = mid_g.select(
                "hb", F.col("sid").alias("rid"), F.col("sig").alias("rsig"),
                F.col("g").alias("g2"),
            )
            pairs_mid = (
                left.join(right, ["hb", "g2"])
                .where(
                    (F.col("g1") < F.col("g2"))
                    | ((F.col("g1") == F.col("g2")) & (F.col("lid") < F.col("rid")))
                )
                .select(
                    F.least("lid", "rid").alias("src"),
                    F.greatest("lid", "rid").alias("dst"),
                    self._dist(F.col("lsig"), F.col("rsig")).alias("dist"),
                )
            )
            raw = raw.unionByName(pairs_mid)
        if max_distance is not None:
            raw = raw.where(F.col("dist") < max_distance)
        return raw.groupBy("src", "dst").agg(F.min("dist").alias("dist"))

    def candidate_pairs(self, sig_df: DataFrame, max_bucket_size: int = 4096,
                        persist: bool = True) -> DataFrame:
        """(src, dst) ids co-bucketed in >=1 table, deduped — public
        id-space wrapper (no distance filter)."""
        if sig_df.schema["id"].dataType.simpleString() == "bigint":
            # long-id fast path: see dedup_pairs
            return self._sid_dist_pairs(
                sig_df, max_bucket_size=max_bucket_size, persist=persist,
                raw_id=True,
            ).select("src", "dst")
        cand = self._sid_dist_pairs(
            sig_df, max_bucket_size=max_bucket_size, persist=persist
        )
        m = sig_df.select(F.xxhash64("id").alias("sid"), "id")
        ma = m.select(F.col("sid").alias("src"), F.col("id").alias("src_id"))
        mb = m.select(F.col("sid").alias("dst"), F.col("id").alias("dst_id"))
        return (
            cand.join(ma, "src")
            .join(mb, "dst")
            .select(
                F.least("src_id", "dst_id").alias("src"),
                F.greatest("src_id", "dst_id").alias("dst"),
            )
        )

    def bucket_stats(
        self,
        sig_df: DataFrame,
        max_bucket_size: int | None = None,
    ) -> DataFrame:
        """C5/O9: avg/max bucket occupancy per table — skew metrics. With
        max_bucket_size, also counts buckets the dedup path excluded
        (n_dropped), so the cap is recorded, never silent."""
        t = self.tables(sig_df)
        aggs = [
            F.count("*").alias("n_buckets"),
            F.avg("n").alias("avg_bucket"),
            F.max("n").alias("max_bucket"),
        ]
        if max_bucket_size is not None:
            aggs.append(
                F.sum((F.col("n") > max_bucket_size).cast("long")).alias("n_dropped")
            )
        return (
            t.groupBy("table_idx", "key")
            .agg(F.count("*").alias("n"))
            .groupBy("table_idx")
            .agg(*aggs)
        )

    def dedup_pairs(self, sig_df: DataFrame, max_distance: int | None = None, **kw) -> DataFrame:
        """(src, dst, dist) pairs with hamming distance strictly below
        max_distance (Q8 strict '<'). The distance filter runs map-side
        inside pair generation — only true pairs reach a shuffle."""
        d = self.cfg.max_distance if max_distance is None else max_distance
        if kw.get("persist", True) and not (
            sig_df.storageLevel.useMemory or sig_df.storageLevel.useDisk
        ):
            sig_df = sig_df.persist()
        # 64-bit-integer ids are valid surrogates themselves: feed them in
        # directly and return candidates as-is — the xxhash64 indirection
        # and both sid->id attach joins disappear (the same long-id fast
        # path as substring's candidate_gram_pairs; at scale those joins
        # are candidate-set shuffles). Canonical (least, greatest) order
        # is preserved: pair generation orders by sid, which for raw
        # longs IS id order.
        if sig_df.schema["id"].dataType.simpleString() == "bigint":
            return self._sid_dist_pairs(
                sig_df, max_distance=d, raw_id=True, **kw
            ).select("src", "dst", "dist")
        cand = self._sid_dist_pairs(sig_df, max_distance=d, **kw)
        m = sig_df.select(F.xxhash64("id").alias("sid"), "id")
        ma = m.select(F.col("sid").alias("src"), F.col("id").alias("src_id"))
        mb = m.select(F.col("sid").alias("dst"), F.col("id").alias("dst_id"))
        return (
            cand.join(ma, "src")
            .join(mb, "dst")
            .select(
                F.least("src_id", "dst_id").alias("src"),
                F.greatest("src_id", "dst_id").alias("dst"),
                "dist",
            )
        )

    # ----------------------------------------------------------------- query
    def sid_tables(self, sig_df: DataFrame) -> DataFrame:
        """Public (sid, tk) table-key rows — the persisted-index artifact
        (the reference's per-table HashMaps, sim_hash_index.rs): insert =
        append these 16-byte rows, query = probe them via
        query(..., index_tables=) so the standing index is never
        re-keyed per probe batch (the SimHash counterpart of
        MinHashLSH.sid_bands)."""
        return self._sid_tables(sig_df).select("sid", "tk")

    def query(
        self,
        index_sigs: DataFrame,
        probe_sigs: DataFrame,
        max_distance: int | None = None,
        keep_distance: bool = False,
        sorted_by_distance: bool = False,
        index_tables: DataFrame | None = None,
    ) -> DataFrame:
        """Q9: (qid, id[, dist]) with dist < max_distance (strict).
        Candidates come from the bipartite bucket machinery (side-tagged
        groupBy over the union of probe and index table keys, cross pairs
        in sid space), ids/signatures attached only to candidates.

        sorted_by_distance=True mirrors the reference's ascending sort of
        each query's matches (sim_hash_index.rs:203 `matches.sort_by(...)`)
        as a (qid, dist, id) orderBy — note a DataFrame's ordering is a
        presentation property (any further transformation may drop it), so
        downstream code should use query_top_k / query_one rather than
        relying on row order.

        index_tables: precomputed (sid, tk) rows from sid_tables() — the
        maintained-index path; stale extra rows (removed docs) only
        produce candidates that vanish in the signature join, but missing
        rows lose recall (same contract as MinHash index_bands)."""
        from gaoya_spark.operators._bucket_pairs import sid_cross_pairs_from_buckets

        d = self.cfg.max_distance if max_distance is None else max_distance
        it = (
            index_tables.select("sid", "tk")
            if index_tables is not None
            else self._sid_tables(index_sigs)
        )
        cand = sid_cross_pairs_from_buckets(
            self._sid_tables(probe_sigs).select("sid", F.col("tk").alias("bk")),
            it.select("sid", F.col("tk").alias("bk")),
        )
        qs = probe_sigs.select(
            F.xxhash64("id").alias("qid"),
            F.col("id").alias("qid_orig"),
            F.col("sig").alias("sig_q"),
        )
        ix = index_sigs.select(
            F.xxhash64("id").alias("id"),
            F.col("id").alias("id_orig"),
            F.col("sig").alias("sig_i"),
        )
        out = (
            cand.join(qs, "qid")
            .join(ix, "id")
            .withColumn("dist", self._dist(F.col("sig_q"), F.col("sig_i")))
            .where(F.col("dist") < d)
            .select(
                F.col("qid_orig").alias("qid"),
                F.col("id_orig").alias("id"),
                "dist",
            )
        )
        cols = (
            ["qid", "id", "dist"]
            if (keep_distance or sorted_by_distance)
            else ["qid", "id"]
        )
        out = out.select(*cols)
        if sorted_by_distance:
            out = out.orderBy(F.asc("qid"), F.asc("dist"), F.asc("id"))
        return out

    def query_one(self, index_sigs: DataFrame, probe_sigs: DataFrame,
                  max_distance: int | None = None) -> DataFrame:
        """Best (minimum-distance) match per query, deterministic tie-break."""
        m = self.query(index_sigs, probe_sigs, max_distance, keep_distance=True)
        w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("id"))
        return m.withColumn("rn", F.row_number().over(w)).where("rn = 1").select(
            "qid", "id", "dist"
        )

    def query_top_k(
        self,
        index_sigs: DataFrame,
        probe_sigs: DataFrame,
        k: int,
        max_distance: int | None = None,
    ) -> DataFrame:
        """k best (lowest-distance) matches per query within the Hamming
        ball, ties broken by id — the distributed form of the reference's
        distance-ascending match list (sim_hash_index.rs:203) truncated to
        k per probe."""
        m = self.query(index_sigs, probe_sigs, max_distance, keep_distance=True)
        w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("id"))
        return (
            m.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("qid", "id", "dist")
        )

    # -------------------------------------------------------------- centroid
    def centroid(self, sig_df: DataFrame, group_col: str) -> DataFrame:
        """P20: per-bit majority vote over each group's signatures
        (sim_hash.rs:57-78) as a JVM-side expression: sum each bit, set it
        when ones strictly outnumber half the members."""
        nbits = self.cfg.nbits
        word_of = (lambda i: F.col("sig")[i // 64]) if self._wide else (
            lambda i: F.col("sig")
        )
        bit_cols = [
            F.sum(F.shiftright(word_of(i), i % 64).bitwiseAND(F.lit(1))).alias(f"b{i}")
            for i in range(nbits)
        ]
        agg = sig_df.groupBy(F.col(group_col).alias("grp")).agg(
            F.count("*").alias("n"), *bit_cols
        )

        def word_expr(lo_bit: int, width: int):
            centroid = None
            for j in range(width):
                i = lo_bit + j
                bit = F.when(F.col(f"b{i}") * 2 > F.col("n"), F.lit(1)).otherwise(F.lit(0))
                # bit 63 of a word contributes -(2^63) in two's complement
                weight = F.lit(-(1 << 63)) if j == 63 else F.lit(1 << j)
                term = bit.cast("long") * weight
                centroid = term if centroid is None else centroid + term
            return centroid

        if self._wide:
            out = F.array(word_expr(0, 64), word_expr(64, 64))
        else:
            out = word_expr(0, nbits)
        return agg.select(F.col("grp").alias(group_col), out.alias("centroid"))
