"""P17 — band parameter calculator (reference doctest vectors,
/root/reference/gaoya/src/minhash/mod.rs:250-257)."""

from gaoya_spark.params import calculate_b_and_r, calculate_minhash_params, lsh_collision_probability


def test_reference_vectors():
    assert calculate_minhash_params(0.5, 128) == (42, 3)
    assert calculate_minhash_params(0.7, 196) == (39, 5)


def test_collision_probability_above_target():
    for s, n in [(0.5, 128), (0.7, 196), (0.8, 256), (0.6, 200)]:
        b, r = calculate_b_and_r(s, n)
        assert lsh_collision_probability(s, b, r) > 0.99
        assert b * r <= n


def test_degenerate():
    b, r = calculate_b_and_r(0.99, 4)
    assert b >= 1 and r >= 1
