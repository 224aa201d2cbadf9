"""Band-parameter selection for MinHash LSH.

Mirrors the semantics of the reference's ``calculate_b_and_r``
(/root/reference/gaoya/src/minhash/mod.rs:270-287): choose the largest
band width ``r`` (and ``b = n // r``) such that the probability that a
pair at exactly the target jaccard similarity collides in at least one
band stays above ``p``:

    P(collide) = 1 - (1 - s^r)^b

Doctest vectors from the reference (mod.rs:250-257):

>>> calculate_minhash_params(0.5, 128)
(42, 3)
>>> calculate_minhash_params(0.7, 196)
(39, 5)
"""

from __future__ import annotations


def lsh_collision_probability(s: float, b: int, r: int) -> float:
    """P(at least one band collides) for a pair with jaccard ``s``."""
    return 1.0 - (1.0 - s**r) ** b


def calculate_b_and_r(s: float, n: int, p: float = 0.99) -> tuple[int, int]:
    """Largest r (and b = n // r) with collision probability > p at sim s."""
    b, r = n, 1
    while b > 1:
        r1 = r + 1
        b1 = n // r1
        if lsh_collision_probability(s, b1, r1) > p:
            b, r = b1, r1
        else:
            break
    return b, r


def calculate_minhash_params(
    jaccard_similarity: float, num_hashes: int, desired_proba: float = 0.99
) -> tuple[int, int]:
    """(num_bands, band_width) for a target similarity threshold."""
    return calculate_b_and_r(jaccard_similarity, num_hashes, desired_proba)
