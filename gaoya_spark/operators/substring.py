"""Exact shared-substring pass over captions (north rule; no reference
counterpart — SURVEY.md §2.6 / §7.2.7).

Semantics: emit (src, dst) when some length->=L substring of one caption
appears verbatim in the other. Key identity: a >=L-char shared substring
exists iff the two captions share at least one exact L-gram (any longer
match contains an L-length window). So the Spark-first scale path is:

  1. distinct L-grams per caption, JVM-side (transform over sequence +
     substring — whole-stage codegen, no Python);
  2. gram -> 64-bit hash (xxhash64) to shrink the shuffle to 8-byte keys;
  3. self-equi-join on gram hash (the shuffle is the suffix "index"),
     hot grams capped like LSH buckets;
  4. per-pair verification with a suffix-automaton longest-common-substring
     (linear-time, per candidate pair, inside a pandas UDF) to kill the
     astronomically-rare hash-collision false positives and report the
     actual LCS length.

This replaces a distributed suffix array: sorting all suffixes groups
identical L-prefixes together, which is exactly what the hash-join on
L-grams achieves with one shuffle and no global sort; the suffix-automaton
verifier provides the exact-match guarantee a suffix array would.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def longest_common_substring_len(a: str, b: str) -> int:
    """LCS length via suffix automaton of `a` streamed over `b` — O(|a|+|b|)."""
    if not a or not b:
        return 0
    # build suffix automaton of a
    MAXN = 2 * len(a) + 5
    nxt: list[dict] = [dict() for _ in range(MAXN)]
    link = [0] * MAXN
    length = [0] * MAXN
    last, size = 0, 1
    link[0] = -1
    for ch in a:
        cur = size
        size += 1
        length[cur] = length[last] + 1
        p = last
        while p != -1 and ch not in nxt[p]:
            nxt[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = nxt[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = size
                size += 1
                length[clone] = length[p] + 1
                nxt[clone] = dict(nxt[q])
                link[clone] = link[q]
                while p != -1 and nxt[p].get(ch) == q:
                    nxt[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    # stream b
    v, cur_len, best = 0, 0, 0
    for ch in b:
        while v and ch not in nxt[v]:
            v = link[v]
            cur_len = length[v]
        if ch in nxt[v]:
            v = nxt[v][ch]
            cur_len += 1
            best = max(best, cur_len)
        else:
            v, cur_len = 0, 0
    return best


def _gram_hashes(text_col, min_len: int):
    """Distinct xxhash64 values of all L-grams of the column — JVM-side."""
    n_positions = F.length(text_col) - F.lit(min_len - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_positions, F.lit(1))),
        lambda i: F.xxhash64(text_col.substr(i, F.lit(min_len))),
    )
    # sequence(1, n) needs n >= 1 (it would count DOWN otherwise); short
    # texts produce an empty gram set instead.
    return F.when(n_positions >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<bigint>")
    )


def candidate_gram_pairs(
    df: DataFrame, id_col: str, text_col: str, min_len: int = 24,
    max_gram_bucket: int = 10_000,
) -> DataFrame:
    """(src, dst) pairs sharing >=1 exact L-gram, deduped. Grams shared by
    more than max_gram_bucket docs (boilerplate at web scale) are dropped —
    surfaced via gram_stats, never silently at default settings for tests."""
    has_len = df.where(F.length(text_col) >= min_len)
    grams = has_len.select(
        F.col(id_col).alias("id"),
        F.explode(_gram_hashes(F.col(text_col), min_len)).alias("gram"),
    )
    sizes = grams.groupBy("gram").agg(F.count("*").alias("n"))
    grams = grams.join(
        F.broadcast(sizes.where(F.col("n") > max_gram_bucket)), "gram", "left_anti"
    )
    a, b = grams.alias("a"), grams.alias("b")
    return (
        a.join(b, "gram")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def substring_pairs(
    df: DataFrame, id_col: str, text_col: str, min_len: int = 24,
    verify: bool = True, **kw,
) -> DataFrame:
    """(src, dst, lcs_len) pairs with an exact shared substring >= min_len.

    verify=True runs the suffix-automaton LCS on each candidate pair
    (removes hash-collision false positives and attaches the true length)."""
    cand = candidate_gram_pairs(df, id_col, text_col, min_len, **kw)
    texts_a = df.select(F.col(id_col).alias("src"), F.col(text_col).alias("text_a"))
    texts_b = df.select(F.col(id_col).alias("dst"), F.col(text_col).alias("text_b"))
    joined = cand.join(texts_a, "src").join(texts_b, "dst")
    if not verify:
        return joined.select("src", "dst", F.lit(min_len).alias("lcs_len"))

    id_type = df.schema[id_col].dataType
    schema = StructType([
        StructField("src", id_type, False),
        StructField("dst", id_type, False),
        StructField("lcs_len", IntegerType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lcs = [
                longest_common_substring_len(a, b)
                for a, b in zip(pdf["text_a"], pdf["text_b"])
            ]
            out = pdf[["src", "dst"]].copy()
            out["lcs_len"] = pd.array(lcs, dtype="int32")
            yield out

    return (
        joined.mapInPandas(run, schema)
        .where(F.col("lcs_len") >= min_len)
    )


def gram_stats(df: DataFrame, id_col: str, text_col: str, min_len: int = 24) -> DataFrame:
    """Skew metrics for the gram join (analogue of LSH band stats)."""
    grams = df.where(F.length(text_col) >= min_len).select(
        F.explode(_gram_hashes(F.col(text_col), min_len)).alias("gram")
    )
    return grams.groupBy("gram").agg(F.count("*").alias("n")).agg(
        F.count("*").alias("n_grams"),
        F.avg("n").alias("avg_docs_per_gram"),
        F.max("n").alias("max_docs_per_gram"),
    )
