"""Tokenization / shingling, mirroring the reference's text module.

- whitespace_split: split on ASCII punctuation OR whitespace, drop empties
  (/root/reference/gaoya/src/text/tokenizers.rs:5-9).
- char shingles of size n, and of every size in [n_from, n_to]
  (/root/reference/gaoya/src/text/tokenizers.rs:17-24, unicode-safe like the
  reference's char-boundary iterator at multi_shingles.rs:45-94 — Python
  string slicing is code-point based, same semantics).
- word shingles: n-grams over the whitespace_split tokens, joined with ""
  (/root/reference/gaoya/src/text/tokenizers.rs:31-36).

These run inside pandas UDF batches (Python-level, but tokenization is a
per-row string op that Spark cannot express natively with identical
semantics; the downstream hashing is vectorized numpy).
"""

from __future__ import annotations

import re

from gaoya_spark.config import TokenizerSpec

# ASCII punctuation (as in Rust char::is_ascii_punctuation: !-/ :-@ [-` {-~)
# union any unicode whitespace. Mirrors tokenizers.rs:5-9.
_SPLIT_RE = re.compile(r"[\s!-/:-@\[-`{-~]+")


def whitespace_split(text: str) -> list[str]:
    return [t for t in _SPLIT_RE.split(text) if t]


def char_shingles(text: str, n: int) -> list[str]:
    if len(text) < n:
        # reference yields nothing for too-short inputs (multi_shingles.rs)
        return []
    return [text[i : i + n] for i in range(len(text) - n + 1)]


def char_shingles_range(text: str, n_from: int, n_to: int) -> list[str]:
    out: list[str] = []
    for n in range(n_from, n_to + 1):
        out.extend(char_shingles(text, n))
    return out


def word_shingles(tokens: list[str], n: int) -> list[str]:
    if len(tokens) < n:
        return []
    return ["".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def word_shingles_range(tokens: list[str], n_from: int, n_to: int) -> list[str]:
    out: list[str] = []
    for n in range(n_from, n_to + 1):
        out.extend(word_shingles(tokens, n))
    return out


def tokenize(text, spec: TokenizerSpec) -> list[str]:
    """Dispatch identical to the reference's tokenize_and_minhash branches
    (/root/reference/py-gaoya/src/min_hash.rs:72-94) plus the callable
    analyzer hook (/root/reference/py-gaoya/gaoya/minhash.py:142-145)."""
    if text is None:
        return []
    if spec.analyzer is not None:
        return list(spec.analyzer(text))
    if spec.lowercase:
        text = text.lower()
    if spec.kind == "char":
        if spec.n_from == spec.n_to:
            return char_shingles(text, spec.n_from)
        return char_shingles_range(text, spec.n_from, spec.n_to)
    words = whitespace_split(text)
    if spec.n_from == 1 and spec.n_to == 1:
        return words
    if spec.n_from == spec.n_to:
        return word_shingles(words, spec.n_from)
    return word_shingles_range(words, spec.n_from, spec.n_to)
