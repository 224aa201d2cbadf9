"""P1-P6 — tokenizer semantics vs the reference's text module."""

from gaoya_spark.config import TokenizerSpec
from gaoya_spark.tokenize import (
    char_shingles,
    char_shingles_range,
    tokenize,
    whitespace_split,
    word_shingles,
)


def test_whitespace_split_punctuation_and_ws():
    # split on ASCII punctuation OR whitespace, drop empties (tokenizers.rs:5-9)
    assert whitespace_split("Hello, world! foo--bar (baz)") == [
        "Hello", "world", "foo", "bar", "baz",
    ]
    assert whitespace_split("a.b,c;d:e") == ["a", "b", "c", "d", "e"]
    assert whitespace_split("  leading  and trailing  ") == ["leading", "and", "trailing"]
    assert whitespace_split("") == []


def test_char_shingles():
    assert char_shingles("abcd", 2) == ["ab", "bc", "cd"]
    assert char_shingles("ab", 3) == []
    assert char_shingles_range("abcd", 2, 3) == ["ab", "bc", "cd", "abc", "bcd"]


def test_char_shingles_unicode_boundaries():
    # python slicing is code-point based, like the reference's char iterator
    assert char_shingles("héllo", 3) == ["hél", "éll", "llo"]


def test_word_shingles_joined_with_empty_string():
    # tokenizers.rs:31-36 joins word n-grams with ""
    assert word_shingles(["a", "b", "c"], 2) == ["ab", "bc"]


def test_tokenize_dispatch():
    spec = TokenizerSpec(kind="word", n_from=1, n_to=1, lowercase=True)
    assert tokenize("The CAT sat", spec) == ["the", "cat", "sat"]
    spec = TokenizerSpec(kind="char", n_from=3, n_to=3)
    assert tokenize("abcd", spec) == ["abc", "bcd"]
    spec = TokenizerSpec(kind="word", n_from=2, n_to=2)
    assert tokenize("a b c", spec) == ["ab", "bc"]


def test_callable_analyzer_hook():
    spec = TokenizerSpec(analyzer=lambda s: s.split("|"))
    assert tokenize("x|y|z", spec) == ["x", "y", "z"]


def test_none_text():
    assert tokenize(None, TokenizerSpec()) == []
