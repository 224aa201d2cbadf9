"""Text-analysis operators for training-data pipelines (brief extension —
no reference counterpart; these are first-class components alongside the
LSH operators). All hot paths are JVM-side column expressions (whole-stage
codegen); the only optional Python crossing is lang_id's pluggable model
hook (Arrow-batched pandas UDF).

Every function returns columns designed to be exactly reproducible in
ANSI SQL for the DuckDB oracle (integer-derived doubles, explicit rounding).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from gaoya_spark.operators._bucket_pairs import sid_pairs_from_buckets

# HEURISTIC PLACEHOLDER, not a production language identifier: 4 languages
# x 6 stopwords, chosen to be deterministic and expressible identically in
# SQL so the operator's Spark plumbing (the part that matters at 100 TB)
# is oracle-checked. A real deployment swaps LANG_STOPWORDS for a proper
# model (fastText/CLD3) behind the same lang_id() column contract.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "a"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "une"],
}


def tokens_col(text, sep: str = " ") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, sep), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "n_tokens", F.size(tokens_col(text_col)).cast("long")
    )


def bpe_token_estimate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token count for LLM-pipeline budgeting: alphanumeric runs
    count one token each, every other non-space character counts one (the
    way byte-pair vocabularies treat punctuation/symbols), plus a 0.3
    surcharge per long run (>8 chars, which real BPE splits into several
    subwords). Deterministic, pure codegen, and exactly expressible in
    ANSI SQL for the oracle — a calibration-free estimator, not a real
    tokenizer."""
    c = F.lower(F.col(text_col))
    runs = F.size(F.filter(F.split(c, r"[^a-z0-9]+"), lambda t: t != ""))
    long_runs = F.size(
        F.filter(F.split(c, r"[^a-z0-9]+"), lambda t: F.length(t) > 8)
    )
    other_chars = F.length(F.regexp_replace(c, r"[a-z0-9\s]+", ""))
    est = runs.cast("double") + 0.3 * long_runs.cast("double") + other_chars.cast("double")
    return df.select(
        *df.columns,
        runs.cast("long").alias("n_word_tokens"),
        other_chars.cast("long").alias("n_symbol_tokens"),
        F.round(est, 1).alias("bpe_token_estimate"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: token count, distinct-token ratio, mean
    word length, and a composite score. Deterministic integer ratios."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    chars = F.length(F.col(text_col))
    mean_wlen = F.when(
        n > 0, F.round((chars - (n - 1)).cast("double") / n, 6)
    ).otherwise(F.lit(0.0))
    distinct_ratio = F.when(
        n > 0, F.round(n_distinct.cast("double") / n, 6)
    ).otherwise(F.lit(0.0))
    score = F.round(
        F.least(n.cast("double") / F.lit(64.0), F.lit(1.0)) * distinct_ratio, 6
    )
    return df.select(
        *df.columns,
        n.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        mean_wlen.alias("mean_word_len"),
        distinct_ratio.alias("distinct_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text", model=None) -> DataFrame:
    """Stopword-ratio language ID: count hits against each language's
    stopword list over the first 64 tokens; argmax with deterministic
    tie-break by language code; 'und' when no hits.

    model: optional callable pandas.Series[str] -> pandas.Series[str] of
    language codes — the pluggable real-model hook (same idea as
    TokenizerSpec.analyzer): wrap fastText/CLD3 here and it runs as an
    Arrow-batched pandas UDF behind the SAME lang_pred column contract, so
    swapping the placeholder table touches no pipeline code. None keeps
    the deterministic stopword default (the SQL-expressible oracle path)."""
    if model is not None:

        @F.pandas_udf("string")
        def _pred(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in it:
                yield pd.Series(model(s), dtype="object")

        return df.withColumn("lang_pred", _pred(F.col(text_col)))
    toks = F.slice(tokens_col(text_col), 1, 64)
    hit_cols = []
    for lang in sorted(LANG_STOPWORDS):
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        hit_cols.append(hits.alias(f"hits_{lang}"))
    with_hits = df.select(*df.columns, *hit_cols)
    # argmax via greatest + chained when (deterministic order)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    expr = F.lit("und")
    for lang in reversed(langs):
        expr = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)
        ).otherwise(expr)
    return with_hits.withColumn("lang_pred", expr).drop(
        *[f"hits_{l}" for l in langs]
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text",
                    gram: int = 16, stride: int = 8) -> DataFrame:
    """Winnowing-lite rolling fingerprint: md5_60 of every `gram`-char
    window at `stride` offsets; fingerprint = (min, max) of window hashes.
    Cross-engine exact (md5-based)."""
    c = F.col(text_col)
    n_windows = F.floor((F.length(c) - gram) / stride) + 1
    hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(n_windows - 1, F.lit(0))),
        lambda i: F.conv(
            F.substring(F.md5(c.substr(i * stride + 1, F.lit(gram))), 1, 15), 16, 10
        ).cast("long"),
    )
    valid = F.length(c) >= gram
    return df.select(
        *df.columns,
        F.when(valid, F.array_min(hashes)).alias("fp_min"),
        F.when(valid, F.array_max(hashes)).alias("fp_max"),
    )


def _ngram_shingle_docs(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, sh): per-doc distinct 64-bit shingle hashes (empty array for
    docs shorter than n)."""
    c = F.col(text_col)
    n_pos = F.length(c) - (n - 1)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_pos, F.lit(1))),
            lambda i: F.xxhash64(c.substr(i, F.lit(n))),
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.when(n_pos >= 1, shingles).otherwise(F.array().cast("array<bigint>")).alias("sh"),
    )


def ngram_shingle_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_bucket: int = 50_000,
) -> DataFrame:
    """Skew report for ngram_jaccard_pairs' blocking key: one row of
    (n_shingles, max_docs_per_shingle, n_dropped) where n_dropped counts
    shingles shared by more than max_shingle_bucket docs — the buckets the
    pairing pass excludes. Pipelines record this next to band_stats /
    gram_stats so capped shingles are never silent."""
    docs = _ngram_shingle_docs(df, id_col, text_col, n)
    sizes = (
        docs.select(F.explode("sh").alias("s"))
        .groupBy("s")
        .agg(F.count("*").alias("cnt"))
    )
    return sizes.agg(
        F.count("*").alias("n_shingles"),
        F.max("cnt").alias("max_docs_per_shingle"),
        F.sum((F.col("cnt") > max_shingle_bucket).cast("long")).alias("n_dropped"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.7,
    max_shingle_bucket: int = 50_000,
    array_bucket_limit: int = 256,
    medium_bucket_limit: int = 1024,
    block_groups: int = 16,
    persist: bool = True,
    gate: bool = False,
) -> DataFrame:
    """Exact char-n-gram jaccard dedup (src, dst, jaccard >= threshold).

    Candidates and intersection counts both come from the shared tiered
    bucket machinery (operators/_bucket_pairs.py): each (shingle-hash, doc)
    membership row is a bucket member, and the returned multiplicity m —
    the number of buckets a pair co-occurs in — IS the exact intersection
    count, because shingles are distinct per doc. union = |A| + |B| - m.
    That inherits the three size tiers (JVM array combinatorics for small
    buckets, identical-set collapse + array for medium, triangle block join
    for hot), so one stopword-gram shared by 40k docs is spread across
    block_groups bounded reducers instead of expanding quadratically inside
    a raw shingle self-join. Shingles shared by more than
    max_shingle_bucket docs are excluded from pairing entirely (recorded by
    ngram_shingle_stats, never silently); below that cap jaccard is exact.

    Docs travel as 8-byte xxhash64(id) surrogates; original ids re-attach
    only to surviving pairs. A surrogate collision (~n^2/2^65) would merge
    two docs' intersection counts — negligible at any real scale and
    impossible at oracle scale.
    """
    docs = _ngram_shingle_docs(df, id_col, text_col, n)
    if persist:
        docs = docs.persist()
    mem = docs.select(
        F.explode("sh").alias("bk"), F.xxhash64("id").alias("sid")
    )
    pairs = sid_pairs_from_buckets(
        mem,
        array_bucket_limit=array_bucket_limit,
        drop_cap=max_shingle_bucket,
        block_groups=block_groups,
        persist=persist,
        medium_bucket_limit=medium_bucket_limit,
        gate=gate,
    )
    m = docs.select(
        F.xxhash64("id").alias("sid"), "id", F.size("sh").alias("n_sh")
    )
    ma = m.select(
        F.col("sid").alias("src"), F.col("id").alias("a_id"), F.col("n_sh").alias("na")
    )
    mb = m.select(
        F.col("sid").alias("dst"), F.col("id").alias("b_id"), F.col("n_sh").alias("nb")
    )
    return (
        pairs.join(ma, "src")
        .join(mb, "dst")
        .withColumn(
            "jaccard",
            F.round(
                F.col("m").cast("double")
                / (F.col("na") + F.col("nb") - F.col("m")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.least("a_id", "b_id").alias("src"),
            F.greatest("a_id", "b_id").alias("dst"),
            "jaccard",
        )
    )
