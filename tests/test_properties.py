"""Hypothesis property tests for the pure-numpy kernels (no Spark)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gaoya_spark import hashing
from gaoya_spark.config import MinHashConfig, TokenizerSpec


def _sig(tokens, cfg):
    h = hashing.hash_tokens(tokens, cfg.token_hasher)
    a, b = hashing.minhash_permutations(cfg.num_hashes, cfg.seed, False)
    return hashing.minhash_signatures(
        h, np.array([len(tokens)]), a, b, cfg.hash_size, cfg.formula, False
    )[0]


@settings(max_examples=25, deadline=None)
@given(
    base=st.sets(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                 min_size=20, max_size=60),
    extra=st.sets(st.text(alphabet="ijklmnop", min_size=1, max_size=6),
                  min_size=0, max_size=40),
)
def test_minhash_estimator_tracks_true_jaccard(base, extra):
    """k=200 estimator: |est - true jaccard| within 4 sigma of the
    binomial std sqrt(j(1-j)/k) (plus slack for hash collisions)."""
    cfg = MinHashConfig(num_bands=50, band_width=4, threshold=0.5,
                        tokenizer=TokenizerSpec())
    A = sorted(base)
    B = sorted(base | extra)
    true_j = len(base) / len(base | extra)
    sa, sb = _sig(A, cfg), _sig(B, cfg)
    est = float((sa == sb).mean())
    tol = 4 * np.sqrt(max(true_j * (1 - true_j), 0.01) / cfg.num_hashes) + 0.02
    assert abs(est - true_j) <= tol, (est, true_j, tol)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=8))
def test_siphash_batch_equals_scalar(msgs):
    """Ragged-batch vectorization is mask-exact vs one-at-a-time."""
    batch = hashing.siphash24_batch(msgs, 5, 6)
    for i, m in enumerate(msgs):
        assert batch[i] == hashing.siphash24_batch([m], 5, 6)[0]


@settings(max_examples=25, deadline=None)
@given(st.sets(st.text(alphabet="abcdefghij", min_size=1, max_size=8),
               min_size=1, max_size=50))
def test_simhash128_words_deterministic_and_distinct(tokens):
    """128-bit simhash: deterministic; the two words derive from
    independent hash streams (equal only in degenerate cases)."""
    toks = sorted(tokens)
    lo_h, hi_h = hashing.hash_tokens_128(toks, "fnv1a")
    c = np.array([len(toks)])
    lo1, hi1 = hashing.simhash_signatures128(lo_h, hi_h, c)
    lo2, hi2 = hashing.simhash_signatures128(lo_h, hi_h, c)
    assert lo1[0] == lo2[0] and hi1[0] == hi2[0]
    assert (lo_h != hi_h).any()


@settings(max_examples=25, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**62),
               min_size=2, max_size=200))
def test_superminhash_estimator_on_ints(vals):
    """SuperMinHash: identical input -> identical signature; estimator of
    a set against itself is exactly 1."""
    h = hashing.splitmix64(np.array(sorted(vals), dtype=np.int64))
    s1 = hashing.superminhash_signatures(h, np.array([len(vals)]), 64)
    s2 = hashing.superminhash_signatures(h, np.array([len(vals)]), 64)
    assert (s1 == s2).all()
