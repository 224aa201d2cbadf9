from gaoya_spark.functions.signatures import (
    make_minhash_udf,
    make_simhash_udf,
    make_minhash_tokens_udf,
    make_simhash_tokens_udf,
)
from gaoya_spark.functions.similarity import (
    minhash_similarity_col,
    minhash_similarity_packed,
    minhash_eq_count_packed,
    pack_signature_col,
    hamming_distance_col,
    hamming_angle_col,
    jaccard_col,
)

__all__ = [
    "make_minhash_udf",
    "make_simhash_udf",
    "make_minhash_tokens_udf",
    "make_simhash_tokens_udf",
    "minhash_similarity_col",
    "minhash_similarity_packed",
    "minhash_eq_count_packed",
    "pack_signature_col",
    "hamming_distance_col",
    "hamming_angle_col",
    "jaccard_col",
]
