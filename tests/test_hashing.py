"""NumPy kernel tests: FNV-1a, minhash/simhash signatures, estimator accuracy.

Reproduces the reference's estimator-accuracy assertions behaviorally
(/root/reference/gaoya/src/minhash/min_hasher.rs:151-165: |minhash_sim -
exact_jaccard| within 0.1-0.15 on near-duplicate sentence pairs)."""

import numpy as np
import pytest

from gaoya_spark import hashing
from gaoya_spark.config import TokenizerSpec
from gaoya_spark.tokenize import tokenize

S1 = ("local sensitive hashing is a technique used in approximate nearest "
      "neighbor search")
S2 = ("local sensitive hashing is a method used in approximate nearest "
      "neighbor search")
S3 = ("local sensitive hashing is one technique used for approximate nearest "
      "neighbor search")


def _fnv1a_ref(b: bytes) -> int:
    h = 0xCBF29CE484222325
    for c in b:
        h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def test_fnv1a_matches_scalar_reference():
    toks = [b"hello", b"world", b"", b"a", b"longer-token-here", "héllo".encode()]
    got = hashing.fnv1a_u64(toks)
    want = np.array([_fnv1a_ref(t) for t in toks], dtype=np.uint64)
    assert (got == want).all()


def _sig(text, num_hashes=128, hash_size=32, formula="gaoya", seed=3):
    toks = tokenize(text, TokenizerSpec(kind="word", n_from=1, n_to=1))
    h = hashing.hash_tokens(toks, "fnv1a")
    a, b = hashing.minhash_permutations(num_hashes, seed, hash_size == 64)
    return hashing.minhash_signatures(
        h, np.array([len(toks)]), a, b, hash_size, formula, hash_size == 64
    )[0]


def _exact_jaccard(t1, t2):
    a = set(tokenize(t1, TokenizerSpec(kind="word", n_from=1, n_to=1)))
    b = set(tokenize(t2, TokenizerSpec(kind="word", n_from=1, n_to=1)))
    return len(a & b) / len(a | b)


@pytest.mark.parametrize("hash_size", [8, 16, 32, 64])
@pytest.mark.parametrize("formula", ["gaoya", "modp"])
def test_estimator_accuracy(hash_size, formula):
    sim12 = hashing.minhash_similarity(
        _sig(S1, hash_size=hash_size, formula=formula),
        _sig(S2, hash_size=hash_size, formula=formula),
    )
    true12 = _exact_jaccard(S1, S2)
    # 8-bit truncation inflates collisions slightly; reference allows 0.15
    tol = 0.15 if hash_size == 8 else 0.1
    assert abs(sim12 - true12) < tol
    sim13 = hashing.minhash_similarity(
        _sig(S1, hash_size=hash_size, formula=formula),
        _sig(S3, hash_size=hash_size, formula=formula),
    )
    assert abs(sim13 - _exact_jaccard(S1, S3)) < tol


def test_identical_docs_similarity_one():
    assert hashing.minhash_similarity(_sig(S1), _sig(S1)) == 1.0


def test_empty_doc_zero_signature():
    # P9: empty token stream -> all-zero signature (min_hasher.rs:96)
    a, b = hashing.minhash_permutations(16, 3, False)
    sig = hashing.minhash_signatures(
        np.empty(0, dtype=np.uint64), np.array([0]), a, b, 32, "gaoya"
    )
    assert (sig == 0).all()


def test_empty_docs_mixed_into_batch():
    toks = ["x", "y", "z"]
    h = hashing.hash_tokens(toks, "fnv1a")
    a, b = hashing.minhash_permutations(8, 3, False)
    sig = hashing.minhash_signatures(
        h, np.array([2, 0, 1]), a, b, 32, "gaoya"
    )
    assert sig.shape == (3, 8)
    assert (sig[1] == 0).all()
    assert not (sig[0] == 0).all() and not (sig[2] == 0).all()


def test_empty_doc_positions_do_not_corrupt_neighbors():
    """Regression: an empty doc at the END of a batch must not truncate the
    previous doc's reduceat segment (and likewise leading/consecutive)."""
    toks = ["x", "y", "z", "w"]
    h = hashing.hash_tokens(toks, "fnv1a")
    a, b = hashing.minhash_permutations(8, 3, False)
    for counts in ([2, 2, 0], [0, 2, 2], [2, 0, 0, 2], [4, 0]):
        sig = hashing.minhash_signatures(h, np.array(counts), a, b, 32, "gaoya")
        # each non-empty doc must equal the signature computed alone
        pos = 0
        for i, c in enumerate(counts):
            if c == 0:
                assert (sig[i] == 0).all()
            else:
                solo = hashing.minhash_signatures(
                    h[pos : pos + c], np.array([c]), a, b, 32, "gaoya"
                )[0]
                assert (sig[i] == solo).all(), (counts, i)
            pos += c
    # same invariant for simhash votes
    for counts in ([2, 2, 0], [0, 4], [3, 0, 1]):
        s = hashing.simhash_signatures(h, np.array(counts))
        pos = 0
        for i, c in enumerate(counts):
            if c == 0:
                assert s[i] == 0
            else:
                solo = hashing.simhash_signatures(h[pos : pos + c], np.array([c]))[0]
                assert s[i] == solo, (counts, i)
            pos += c


def test_simhash_near_duplicates_close():
    # behavioral mirror of sim_hash.rs:96-110 — near-identical paragraphs
    # land within hamming distance 8 at 64 bits
    def sh(text):
        toks = tokenize(text, TokenizerSpec(kind="word", n_from=1, n_to=1))
        h = hashing.hash_tokens(toks, "fnv1a")
        return hashing.simhash_signatures(h, np.array([len(toks)]))[0]

    d = hashing.hamming_distance(np.array([sh(S1)]), np.array([sh(S2)]))[0]
    assert d < 8
    d_self = hashing.hamming_distance(np.array([sh(S1)]), np.array([sh(S1)]))[0]
    assert d_self == 0


def test_simhash_empty_doc():
    sig = hashing.simhash_signatures(np.empty(0, dtype=np.uint64), np.array([0]))
    assert sig[0] == 0


def test_simhash_phash_folding_moves_bits():
    toks = ["a", "b", "c"]
    h = hashing.hash_tokens(toks, "fnv1a")
    base = hashing.simhash_signatures(h, np.array([3]))[0]
    folded = hashing.simhash_signatures(
        h, np.array([3]), phash=np.array([0x0F0F0F0F0F0F0F0F]), phash_weight=10
    )[0]
    assert base != folded


def test_md5_60_matches_sql_engines():
    # value verified against Spark conv(substr(md5('hello'),1,15),16,10)
    # and DuckDB ('0x'||substr(md5('hello'),1,15))::bigint
    assert hashing.md5_60("hello") == 419982666956583591


def test_splitmix64_deterministic_and_spread():
    x = np.arange(1000, dtype=np.int64)
    h = hashing.splitmix64(x)
    assert len(np.unique(h)) == 1000
    assert (hashing.splitmix64(x) == h).all()


def test_superminhash_estimator_and_sentinel():
    """P10 (SuperMinHash V1, super_min_hash.rs:37-58): estimator within
    reference tolerance; empty docs keep the 99999999 initializer."""
    from gaoya_spark.config import TokenizerSpec
    spec = TokenizerSpec(kind="word", n_from=1, n_to=1)
    def sig(text, m=256):
        toks = tokenize(text, spec)
        h = hashing.hash_tokens(toks, "fnv1a")
        return hashing.superminhash_signatures(h, np.array([len(toks)]), m)[0]
    est = float((sig(S1) == sig(S2)).mean())
    assert abs(est - _exact_jaccard(S1, S2)) < 0.15
    assert (sig(S1) == sig(S1)).all()
    e = hashing.superminhash_signatures(np.empty(0, dtype=np.uint64), np.array([0]), 8)
    assert (e == 99999999).all()


def test_siphash24_official_vectors():
    """SipHash-2-4 known-answer test: the Aumasson/Bernstein reference
    vectors (vectors_sip64 from the reference C implementation), key =
    00..0f, message = first N bytes of 00 01 02 ... The published vectors
    are little-endian byte arrays; compare in that form."""
    k0, k1 = 0x0706050403020100, 0x0F0E0D0C0B0A0908
    msgs = [bytes(range(n)) for n in range(8)]
    got = hashing.siphash24_batch(msgs, k0, k1)
    expected_bytes = [
        "310e0edd47db6f72", "fd67dc93c539f874", "5a4fa9d909806c0d",
        "2d7efbd796666785", "b7877127e09427cf", "8da699cd64557618",
        "cee3fe586e46c9cb", "37d1018bf50002ab",
    ]
    for g, e in zip(got, expected_bytes):
        assert int(g).to_bytes(8, "little").hex() == e


def test_siphash24_batch_matches_scalar_and_rust_framing():
    """Batch vectorization is mask-correct across ragged lengths, and the
    token path appends Rust's Hash-for-str 0xff terminator with the
    reference's (5, 6) keys (py-gaoya/src/sim_hash.rs SimSipHasher64)."""
    import numpy as np

    tokens = ["", "a", "hello", "x" * 7, "y" * 8, "z" * 23, "mixed é中"]
    batch = hashing.siphash24_many(tokens)
    for i, t in enumerate(tokens):
        single = hashing.siphash24_batch([t.encode("utf-8") + b"\xff"], 5, 6)
        assert batch[i] == single[0]
    assert len(np.unique(batch)) == len(tokens)


def test_siphash24_hasher_plugs_into_simhash():
    """token_hasher='siphash24' is a first-class config value (P12)."""
    from gaoya_spark.config import SimHashConfig, TokenizerSpec

    cfg = SimHashConfig(
        nbits=64, num_blocks=6, max_distance=5,
        tokenizer=TokenizerSpec(kind="word", n_from=1, n_to=1),
        token_hasher="siphash24",
    )
    toks = tokenize(S1, cfg.tokenizer)
    h = hashing.hash_tokens(toks, "siphash24")
    sig = hashing.simhash_signatures(h, np.array([len(toks)]), 64)
    sig2 = hashing.simhash_signatures(h, np.array([len(toks)]), 64)
    assert sig[0] == sig2[0]


def test_sha1_64_hasher():
    """Sha1Hasher parity shape (hashers.rs:17-38): first 8 SHA-1 digest
    bytes big-endian over the Rust str framing. Known-answer: computable
    with hashlib directly."""
    import hashlib as _h

    for t in ["", "abc", "hello world", "é中"]:
        expect = int.from_bytes(
            _h.sha1(t.encode("utf-8") + b"\xff").digest()[:8], "big"
        )
        assert hashing.sha1_64(t) == expect
    arr = hashing.hash_tokens(["a", "b", "a"], "sha1")
    assert arr[0] == arr[2] != arr[1]


def test_siphash24_128_official_vectors():
    """SipHash-2-4-128 against the official veorq/SipHash vectors_sip128
    (key 000102..0f, msg 00..len-1): exact parity with the siphasher
    crate's sip128::SipHasher the reference uses as SimSipHasher128
    (gaoya/src/simhash/sim_hasher.rs:2,64-90)."""
    import numpy as np

    k0, k1 = 0x0706050403020100, 0x0F0E0D0C0B0A0908
    msgs = [bytes(range(n)) for n in range(4)]
    lo, hi = hashing.siphash24_128_batch(msgs, k0, k1)
    expected = [
        "a3817f04ba25a8e66df67214c7550293",
        "da87c1d86b99af44347659119b22fc45",
        "8177228da4a45dc7fca38bdef60affe4",
        "9c70b60c5267a94e5f33b6b02985ed51",
    ]
    for i, exp in enumerate(expected):
        got = (
            np.array([lo[i]], dtype="<u8").tobytes()
            + np.array([hi[i]], dtype="<u8").tobytes()
        ).hex()
        assert got == exp


def test_hash_tokens_128_siphash_words_independent():
    """hash_tokens_128('siphash24') returns genuine 128-bit hashes (hi is
    NOT splitmix64(lo)) with the Rust str framing."""
    import numpy as np

    tokens = ["", "a", "hello", "é中", "x" * 23]
    lo, hi = hashing.hash_tokens_128(tokens, "siphash24")
    lo2, hi2 = hashing.siphash24_128_batch(
        [t.encode("utf-8") + b"\xff" for t in tokens], 5, 6
    )
    assert np.array_equal(lo, lo2) and np.array_equal(hi, hi2)
    assert not np.array_equal(hi, hashing.splitmix64(lo.view(np.int64)))


def test_superminhash_v2_estimator_and_sentinel():
    """P10 V2 (SuperMinHash32V2, super_min_hash.rs:60-135): the optimized
    partial-Fisher-Yates variant estimates jaccard within the reference's
    own test tolerance (its tests assert |est - actual| < 0.15 on these
    string pairs), deterministically; empty docs keep the 99999999
    initializer."""
    from gaoya_spark.config import TokenizerSpec

    spec = TokenizerSpec(kind="word", n_from=1, n_to=1)

    def sig(text, m=256):
        toks = tokenize(text, spec)
        h = hashing.hash_tokens(toks, "fnv1a")
        return hashing.superminhash_v2_signatures(h, np.array([len(toks)]), m)[0]

    est = float((sig(S1) == sig(S2)).mean())
    assert abs(est - _exact_jaccard(S1, S2)) < 0.15
    assert (sig(S1) == sig(S1)).all()
    # multi-doc batching agrees with per-doc runs
    toks1 = tokenize(S1, spec)
    toks2 = tokenize(S2, spec)
    h = hashing.hash_tokens(toks1 + toks2, "fnv1a")
    both = hashing.superminhash_v2_signatures(
        h, np.array([len(toks1), len(toks2)]), 64
    )
    assert (both[0] == sig(S1, 64)).all() and (both[1] == sig(S2, 64)).all()
    e = hashing.superminhash_v2_signatures(np.empty(0, dtype=np.uint64), np.array([0]), 8)
    assert (e == 99999999).all()


def test_superminhash_v2_scheme_plugs_into_config():
    from gaoya_spark.config import MinHashConfig

    cfg = MinHashConfig(num_bands=8, band_width=8, scheme="superminhash_v2")
    assert cfg.num_hashes == 64


def test_word_tokens_batch_bit_identical_and_fallback():
    """fnv1a_word_tokens_batch (the vectorized word path, round 6) must be
    BIT-identical to hash_tokens(whitespace_split(text)) per doc — same
    counts, same hashes doc-major — and bail out (None) on non-ASCII so
    the caller falls back to the Python tokenizer."""
    import numpy as np

    from gaoya_spark.tokenize import tokenize
    from gaoya_spark.config import TokenizerSpec

    texts = [
        "Hello, world! foo-bar_baz 123",
        "",
        None,
        "   leading and trailing   ",
        "punct!!!only???",
        "a",
        "MiXeD Case WORDS here",
        "tabs\tand\nnewlines\r\nok",
        "semi;colon [brackets] {braces} (parens) `tick` ~tilde~",
        "repeat repeat repeat",
        "ctrl\x1cchars\x1dsplit\x1etoo\x1fyes",
    ]
    for lc in (False, True):
        spec = TokenizerSpec(kind="word", n_from=1, n_to=1, lowercase=lc)
        res = hashing.fnv1a_word_tokens_batch(list(texts), lc)
        assert res is not None
        h_fast, c_fast = res
        tok_lists = [tokenize(t, spec) for t in texts]
        c_py = np.array([len(t) for t in tok_lists])
        h_py = hashing.hash_tokens(
            [t for toks in tok_lists for t in toks], "fnv1a"
        )
        assert (c_fast == c_py).all()
        assert (h_fast == h_py).all()
    assert hashing.fnv1a_word_tokens_batch(["héllo wörld"], False) is None
    h, c = hashing.fnv1a_word_tokens_batch(["!!!", "   "], False)
    assert len(h) == 0 and (c == 0).all()
    h, c = hashing.fnv1a_word_tokens_batch([], False)
    assert len(h) == 0 and len(c) == 0
