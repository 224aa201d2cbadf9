"""JVM-side similarity expressions (whole-stage codegen; no Python).

These are the verify-path kernels — they run on every candidate pair, so
they must stay inside Tungsten codegen:

- minhash_similarity_col: fraction of equal signature positions
  (/root/reference/gaoya/src/minhash/mod.rs:118-130). Expressed as
  aggregate(zip_with(a, b, equality), +) / k.
- hamming_distance_col: bit_count(a XOR b)
  (/root/reference/gaoya/src/simhash/mod.rs:49-54).
- jaccard_col: exact jaccard of two token arrays
  (/root/reference/gaoya/src/minhash/mod.rs:86-95).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def minhash_similarity_col(a, b, num_hashes: int) -> Column:
    # size(filter(zip_with(equality))) measures ~4x faster than an
    # aggregate() fold on the same pairs (higher-order aggregate is
    # interpreted per element; size/filter vectorize better)
    eq = F.zip_with(a, b, lambda x, y: x == y)
    matches = F.size(F.filter(eq, lambda m: m))
    return matches.cast("double") / F.lit(float(num_hashes))


def hamming_distance_col(a, b) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


def hamming_angle_col(a, b, nbits: int = 64) -> Column:
    """P16 hamming_angle (gaoya/src/simhash/mod.rs:77-80): the angle
    estimate d * pi / bitlen implied by the sign-random-projection LSH."""
    import math

    return hamming_distance_col(a, b).cast("double") * F.lit(math.pi / nbits)


def jaccard_col(tokens_a, tokens_b) -> Column:
    inter = F.size(F.array_intersect(tokens_a, tokens_b)).cast("double")
    union = F.size(F.array_union(tokens_a, tokens_b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
