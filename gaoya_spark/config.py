"""Configuration dataclasses for the LSH engine.

Defaults mirror the reference's Python bindings:
- MinHash: 42 bands x 3 rows, jaccard threshold 0.5, u32 hashes
  (/root/reference/py-gaoya/src/min_hash.rs:33-36)
- SimHash: 64-bit, 6 blocks, max hamming distance 5
  (/root/reference/py-gaoya/src/sim_hash.rs:23-29)
- Tokenizer: char shingles, range (3, 4)
  (/root/reference/py-gaoya/src/lib.rs:41)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from gaoya_spark.params import calculate_b_and_r

MERSENNE_PRIME_31 = (1 << 31) - 1
MERSENNE_PRIME_61 = (1 << 61) - 1

# token hashers (see gaoya_spark.hashing). "fnv1a" is the fast default
# (mirrors the reference's FNV default, /root/reference/gaoya/src/minhash/
# hashers.rs:17-38); "md5_60" is a slow, cross-engine-deterministic hash
# (both Spark's conv(substr(md5(x),1,15),16,10) and DuckDB's
# ('0x'||substr(md5(x),1,15))::bigint produce the identical value) used by
# the DuckDB-oracle parity queries; "siphash24" is SipHash-2-4 with the
# reference's (5, 6) keys and Rust Hash-for-str framing (SimSipHasher64,
# py-gaoya/src/sim_hash.rs:171) for config-level compatibility; "sha1" is
# the reference's Sha1Hasher (first 8 SHA-1 digest bytes, big-endian).
TOKEN_HASHERS = ("fnv1a", "md5_60", "siphash24", "sha1")

# signature formulas:
# - "gaoya": sig_i = min over tokens of ((h *u32 a_i) +u32 b_i) % (2^31-1)
#   with u32 wrapping arithmetic — bit-for-bit the reference's formula
#   (/root/reference/gaoya/src/minhash/min_hasher.rs:85-94).
# - "modp": sig_i = min((a_i * (h % P) + b_i) % P) with wide int64 math —
#   an equally valid universal-hash family that is exactly expressible in
#   ANSI SQL (no wrapping semantics), used for DuckDB-oracle parity.
SIGNATURE_FORMULAS = ("gaoya", "modp")


@dataclass(frozen=True)
class TokenizerSpec:
    """Mirror of the reference's TokenizerSpecification
    (/root/reference/py-gaoya/src/lib.rs:22-60).

    kind: "char" (char n-gram shingles) or "word" (split on ASCII
    punctuation/whitespace, then optional word n-grams joined with "").
    n_from/n_to: shingle size range, inclusive. n_from == n_to == 1 with
    kind="word" means plain word tokens.
    analyzer: optional user callable ``str -> list[str]`` that replaces the
    built-in tokenization entirely (mirrors the pluggable Python analyzer,
    /root/reference/py-gaoya/gaoya/minhash.py:142-145).
    """

    kind: str = "char"
    n_from: int = 3
    n_to: int = 4
    lowercase: bool = False
    analyzer: Optional[Callable[[str], list]] = None

    def __post_init__(self):
        if self.kind not in ("char", "word"):
            raise ValueError(f"tokenizer kind must be char|word, got {self.kind}")
        if not (1 <= self.n_from <= self.n_to):
            raise ValueError("need 1 <= n_from <= n_to")


@dataclass(frozen=True)
class MinHashConfig:
    num_bands: int = 42
    band_width: int = 3
    threshold: float = 0.5
    hash_size: int = 32  # 8 | 16 | 32 | 64 — signature element width
    tokenizer: TokenizerSpec = field(default_factory=TokenizerSpec)
    token_hasher: str = "fnv1a"
    formula: str = "gaoya"
    # "affine" = k independent affine hashes (the reference's MinHasher);
    # "superminhash" = one-permutation SuperMinHash (reference's
    # experimental P10 V1 variant, lower estimator variance);
    # "superminhash_v2" = the paper's optimized partial-Fisher-Yates
    # variant (SuperMinHash32V2, super_min_hash.rs:60-135) — sequential
    # per doc, reference-parity path
    scheme: str = "affine"
    seed: int = 3  # reference default StdRng::seed_from_u64(3)
    # phash folding (north rule): when a phash column is supplied, its 8
    # bytes are appended as extra tokens ("\x00ph{i}:{byte}") so near-equal
    # images raise jaccard similarity even with differing captions.
    phash_token_weight: int = 1

    def __post_init__(self):
        if self.hash_size not in (8, 16, 32, 64):
            raise ValueError("hash_size must be 8|16|32|64")
        if self.token_hasher not in TOKEN_HASHERS:
            raise ValueError(f"unknown token_hasher {self.token_hasher}")
        if self.formula not in SIGNATURE_FORMULAS:
            raise ValueError(f"unknown formula {self.formula}")
        if self.scheme not in ("affine", "superminhash", "superminhash_v2"):
            raise ValueError(f"unknown scheme {self.scheme}")

    @property
    def num_hashes(self) -> int:
        return self.num_bands * self.band_width

    @classmethod
    def for_threshold(cls, threshold: float, num_hashes: int = 126, **kw):
        b, r = calculate_b_and_r(threshold, num_hashes)
        return cls(num_bands=b, band_width=r, threshold=threshold, **kw)


@dataclass(frozen=True)
class SimHashConfig:
    nbits: int = 64  # 32 | 64 | 128 (128 = two-long-word signature)
    num_blocks: int = 6
    max_distance: int = 5  # strict '<' filter, mirroring Q8 semantics
    tokenizer: TokenizerSpec = field(
        default_factory=lambda: TokenizerSpec(kind="word", n_from=1, n_to=1)
    )
    token_hasher: str = "fnv1a"
    # phash folding (north rule): phash bits vote directly in the simhash
    # bit-majority with this weight (0 disables).
    phash_vote_weight: int = 0

    def __post_init__(self):
        if self.nbits not in (32, 64, 128):
            raise ValueError("nbits must be 32|64|128")
        if not (0 < self.num_blocks <= self.nbits):
            raise ValueError("bad num_blocks")
        if not (0 <= self.max_distance < self.num_blocks):
            raise ValueError("need 0 <= max_distance < num_blocks")
