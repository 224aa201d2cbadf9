from gaoya_spark.functions.signatures import (
    make_minhash_udf,
    make_simhash_udf,
    make_minhash_tokens_udf,
    make_simhash_tokens_udf,
)
from gaoya_spark.functions.similarity import (
    minhash_similarity_col,
    hamming_distance_col,
    jaccard_col,
)

__all__ = [
    "make_minhash_udf",
    "make_simhash_udf",
    "make_minhash_tokens_udf",
    "make_simhash_tokens_udf",
    "minhash_similarity_col",
    "hamming_distance_col",
    "jaccard_col",
]
