from gaoya_spark.operators.minhash_lsh import MinHashLSH
from gaoya_spark.operators.simhash_lsh import SimHashLSH
from gaoya_spark.operators.cluster import (
    clusters_from_labels,
    connected_components,
    duplicate_pair_recall,
)
from gaoya_spark.operators.dedup import (
    embedding_dedup,
    exact_dedup,
    exact_dup_pairs,
    minhash_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
)
from gaoya_spark.operators.substring import substring_pairs
from gaoya_spark.operators.text import (
    bpe_token_estimate,
    doc_fingerprint,
    lang_id,
    ngram_jaccard_pairs,
    quality_score,
    token_count,
)
from gaoya_spark.operators.ann import brute_force_topk, ivf_topk, rp_lsh_topk
from gaoya_spark.operators.star_cluster import star_clusters

__all__ = [
    "MinHashLSH",
    "SimHashLSH",
    "connected_components",
    "clusters_from_labels",
    "star_clusters",
    "duplicate_pair_recall",
    "exact_dedup",
    "exact_dup_pairs",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "embedding_dedup",
    "substring_pairs",
    "token_count",
    "bpe_token_estimate",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "ngram_jaccard_pairs",
    "brute_force_topk",
    "rp_lsh_topk",
    "ivf_topk",
]
