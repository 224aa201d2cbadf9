"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship near-dup clustering pipeline on sf0.001.
queries()         — one callable per implemented operator (SURVEY.md §2).
oracle_sql()      — DuckDB-equivalent ANSI SQL for each query.

Cross-engine determinism: oracle-checked LSH queries use the md5_60 token
hash (identical in Spark `conv(substr(md5(x),1,15),16,10)` and DuckDB
`('0x'||substr(md5(x),1,15))::bigint`) and the "modp" signature formula
(wide-int64 affine mod 2^31-1, exactly expressible in ANSI SQL). The
engine's fast default (FNV-1a + u32-wrapping gaoya formula) is exercised by
pytest and bench instead, where bit-identical SQL is not required.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

from gaoya_spark import hashing
from gaoya_spark.config import MinHashConfig, SimHashConfig, TokenizerSpec
from gaoya_spark.operators.cluster import clusters_from_labels, connected_components
from gaoya_spark.operators.minhash_lsh import MinHashLSH
from gaoya_spark.operators.simhash_lsh import SimHashLSH

# ---------------------------------------------------------------------------
# shared oracle-parity config: word tokens split on single space (the
# documents table is single-space separated), md5_60 token hash, modp
# formula, 16 hashes = 4 bands x 4 rows.
# ---------------------------------------------------------------------------

_SPACE_TOKENIZER = TokenizerSpec(
    analyzer=lambda s: [t for t in s.split(" ") if t]
)

ORACLE_MINHASH = MinHashConfig(
    num_bands=4,
    band_width=4,
    threshold=0.5,
    hash_size=32,
    tokenizer=_SPACE_TOKENIZER,
    token_hasher="md5_60",
    formula="modp",
    seed=3,
)

_A, _B = hashing.minhash_permutations(ORACLE_MINHASH.num_hashes, ORACLE_MINHASH.seed, False)
_P = (1 << 31) - 1

# engine-default config for the flagship pipeline (fast FNV path)
FLAGSHIP_MINHASH = MinHashConfig(
    num_bands=42,
    band_width=3,
    threshold=0.5,
    tokenizer=TokenizerSpec(kind="word", n_from=1, n_to=1, lowercase=True),
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Near-duplicate clustering of sf0.001 documents: MinHash signatures ->
    banded LSH candidate pairs -> signature verify -> connected components.
    Returns (doc_id, component, cluster_size) for every document."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    lsh = MinHashLSH(FLAGSHIP_MINHASH)
    sigs = lsh.signatures(docs, "doc_id", "text")
    pairs = lsh.dedup_pairs(sigs)
    labels = connected_components(
        pairs, nodes=docs.select("doc_id"), max_iter=20
    )
    sizes = labels.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "component")
        .select(F.col("id").alias("doc_id"), "component", "cluster_size")
    )


# ---------------------------------------------------------------------------
# oracle-checked queries
# ---------------------------------------------------------------------------

def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    return _docs(spark, sf_dir).select(
        "doc_id", F.size(toks).cast("long").alias("n_tokens")
    )


def _q_exact_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, F.col("a.text") == F.col("b.text"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )


def _q_exact_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keep-smallest-id: representative row per distinct text."""
    d = _docs(spark, sf_dir)
    return d.groupBy("text").agg(F.min("doc_id").alias("keep_id")).select("keep_id")


def _minhash_sigs_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    lsh = MinHashLSH(ORACLE_MINHASH)
    return lsh.signatures(_docs(spark, sf_dir), "doc_id", "text")


def _q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 4 signature positions as scalar columns (cross-engine digest)."""
    sigs = _minhash_sigs_oracle(spark, sf_dir)
    return sigs.select(
        F.col("id").alias("doc_id"),
        *[F.col("sig")[i].cast("long").alias(f"mh{i}") for i in range(4)],
    )


def _q_minhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidate pairs verified at jaccard-estimate >= 0.5 (Q2)."""
    lsh = MinHashLSH(ORACLE_MINHASH)
    sigs = _minhash_sigs_oracle(spark, sf_dir)
    return lsh.dedup_pairs(sigs).select(
        "src", "dst", F.round("sim", 6).alias("sim")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "token_count": _q_token_count,
        "exact_dup_pairs": _q_exact_dup_pairs,
        "exact_dedup_keep_first": _q_exact_dedup_keep_first,
        "minhash_signature": _q_minhash_signature,
        "minhash_band_pairs": _q_minhash_band_pairs,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (same parquet tables, pre-registered views)
# ---------------------------------------------------------------------------

def _sql_tokens_cte() -> str:
    return (
        "toks AS (SELECT doc_id, tok FROM documents, "
        "unnest(string_split(text, ' ')) AS t(tok) WHERE tok <> ''), "
        "th AS (SELECT DISTINCT doc_id, "
        "(('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647 AS h FROM toks)"
    )


def _sql_sig_cte() -> str:
    mins = ", ".join(
        f"min(({int(_A[i])} * h + {int(_B[i])}) % {_P}) AS s{i}"
        for i in range(ORACLE_MINHASH.num_hashes)
    )
    return f"sig AS (SELECT doc_id, {mins} FROM th GROUP BY doc_id)"


def _sql_bands_cte() -> str:
    b, r = ORACLE_MINHASH.num_bands, ORACLE_MINHASH.band_width
    parts = []
    for bi in range(b):
        cols = ", ".join(f"s{bi * r + j}" for j in range(r))
        parts.append(
            f"SELECT doc_id, {bi} AS band_idx, concat_ws('-', {cols}) AS key FROM sig"
        )
    return "bands AS (" + " UNION ALL ".join(parts) + ")"


def _sql_minhash_pairs() -> str:
    k = ORACLE_MINHASH.num_hashes
    eq = " + ".join(
        f"(CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END)" for i in range(k)
    )
    return (
        f"WITH {_sql_tokens_cte()}, {_sql_sig_cte()}, {_sql_bands_cte()}, "
        "pairs AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst "
        "FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.key = b.key "
        "AND a.doc_id < b.doc_id) "
        f"SELECT p.src, p.dst, round(({eq}) / {k}.0, 6) AS sim "
        "FROM pairs p JOIN sig sa ON p.src = sa.doc_id "
        "JOIN sig sb ON p.dst = sb.doc_id "
        f"WHERE ({eq}) / {k}.0 >= 0.5"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "token_count": (
            "SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS BIGINT) AS n_tokens FROM documents"
        ),
        "exact_dup_pairs": (
            "SELECT a.doc_id AS src, b.doc_id AS dst FROM documents a "
            "JOIN documents b ON a.text = b.text AND a.doc_id < b.doc_id"
        ),
        "exact_dedup_keep_first": (
            "SELECT min(doc_id) AS keep_id FROM documents GROUP BY text"
        ),
        "minhash_signature": (
            f"WITH {_sql_tokens_cte()}, {_sql_sig_cte()} "
            "SELECT doc_id, CAST(s0 AS BIGINT) AS mh0, CAST(s1 AS BIGINT) AS mh1, "
            "CAST(s2 AS BIGINT) AS mh2, CAST(s3 AS BIGINT) AS mh3 FROM sig"
        ),
        "minhash_band_pairs": _sql_minhash_pairs(),
    }
