"""Property-based tests (hypothesis) for the pure kernels — beyond the
reference's example-based suite (it has none; SURVEY.md §5)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gaoya_spark import hashing
from gaoya_spark.params import calculate_b_and_r, lsh_collision_probability
from gaoya_spark.tokenize import char_shingles, char_shingles_range, whitespace_split

text_st = st.text(min_size=0, max_size=200)
ascii_st = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80)


@given(text_st)
def test_whitespace_split_no_empties_or_separators(t):
    toks = whitespace_split(t)
    for tok in toks:
        assert tok
        assert not any(c.isspace() for c in tok)
        assert not any(33 <= ord(c) <= 47 or 58 <= ord(c) <= 64
                       or 91 <= ord(c) <= 96 or 123 <= ord(c) <= 126 for c in tok)


@given(text_st, st.integers(1, 8))
def test_char_shingle_count(t, n):
    assert len(char_shingles(t, n)) == max(len(t) - n + 1, 0)
    for s in char_shingles(t, n):
        assert len(s) == n and s in t


@given(st.lists(ascii_st, min_size=1, max_size=20))
def test_fnv_batch_matches_scalar(tokens):
    got = hashing.fnv1a_u64([t.encode() for t in tokens])
    for i, t in enumerate(tokens):
        h = 0xCBF29CE484222325
        for c in t.encode():
            h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        assert got[i] == h


@given(st.lists(text_st, min_size=1, max_size=12), st.integers(1, 3), st.integers(0, 2))
@settings(max_examples=50)
def test_vectorized_shingle_counts_match_python(texts, n_from, extra):
    n_to = n_from + extra
    h, c = hashing.fnv1a_char_shingles_batch(texts, n_from, n_to)
    assert len(h) == c.sum()
    for i, t in enumerate(texts):
        assert c[i] == len(char_shingles_range(t, n_from, n_to))


@given(st.lists(text_st, min_size=2, max_size=8))
@settings(max_examples=50)
def test_vectorized_shingles_doc_independent(texts):
    """Each doc's hash multiset is independent of its batch neighbors."""
    h, c = hashing.fnv1a_char_shingles_batch(texts, 3, 4)
    segs = np.split(h, np.cumsum(c)[:-1])
    for i, t in enumerate(texts):
        solo_h, solo_c = hashing.fnv1a_char_shingles_batch([t], 3, 4)
        assert sorted(solo_h) == sorted(segs[i])


@given(st.floats(0.05, 0.95), st.integers(8, 512))
def test_band_params_valid(s, n):
    b, r = calculate_b_and_r(s, n)
    assert 1 <= b * r <= n and r >= 1
    if b > 1 or r > 1:
        assert lsh_collision_probability(s, b, r) > 0.99 or (b, r) == (n, 1)


@given(st.lists(st.integers(1, 10_000), min_size=1, max_size=60),
       st.lists(st.integers(1, 10_000), min_size=1, max_size=60))
@settings(max_examples=30)
def test_minhash_estimator_bounds(xs, ys):
    a, b = hashing.minhash_permutations(128, 3, False)
    hx = hashing.splitmix64(np.array(xs, dtype=np.int64))
    hy = hashing.splitmix64(np.array(ys, dtype=np.int64))
    sx = hashing.minhash_signatures(hx, np.array([len(xs)]), a, b, 32, "gaoya")[0]
    sy = hashing.minhash_signatures(hy, np.array([len(ys)]), a, b, 32, "gaoya")[0]
    sim = hashing.minhash_similarity(sx, sy)
    assert 0.0 <= sim <= 1.0
    true_j = len(set(xs) & set(ys)) / len(set(xs) | set(ys))
    # 128 hashes: bound the estimator error loosely (5 sigma)
    sigma = (true_j * (1 - true_j) / 128) ** 0.5
    assert abs(sim - true_j) <= 5 * sigma + 0.06
    if set(xs) == set(ys):
        assert sim == 1.0


@given(st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=40))
def test_simhash_self_distance_zero(xs):
    h = hashing.splitmix64(np.array(xs, dtype=np.int64))
    s = hashing.simhash_signatures(h, np.array([len(xs)]))
    assert hashing.hamming_distance(s, s)[0] == 0
