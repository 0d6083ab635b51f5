"""Tokenizer edge-rule tests (SURVEY.md §2.2 semantics)."""

import pytest

from text_similarity_node_spark.config import AlgorithmConfig, Preprocessing
from text_similarity_node_spark.functions.tokenize import ngrams, tokenize, words
from text_similarity_node_spark.functions.unicode import fold_string
from text_similarity_node_spark.operators.suffix import _rolling_fingerprints


def cfg(mode, **kw):
    return AlgorithmConfig(preprocessing=mode, **kw)


def test_character_tokens_are_codepoints():
    assert tokenize("ab😀", cfg(Preprocessing.CHARACTER)) == ["a", "b", "😀"]


def test_word_tokens_ascii_class():
    assert words("hello, world_9 x!") == ["hello", "world_9", "x"]
    # non-ASCII letters are NOT \w under ASCII semantics (byte-regex parity)
    assert words("héllo") == ["h", "llo"]


def test_ngram_short_string_rule():
    assert ngrams("abc", 5) == ["abc"]  # len < n -> whole string
    assert ngrams("", 3) == []
    assert ngrams("abcd", 2) == ["ab", "bc", "cd"]
    with pytest.raises(ValueError):
        ngrams("abc", 0)


def test_none_mode_whole_string():
    assert tokenize("a b", cfg(Preprocessing.NONE)) == ["a b"]


def test_case_fold_before_tokenize():
    t = tokenize("AbC", cfg(Preprocessing.CHARACTER, case_sensitive=False))
    assert t == ["a", "b", "c"]


def test_fold_table_scope():
    # table-fold covers ASCII, Latin-1 (minus multiplication sign), Greek
    # (incl. accented + final sigma), Cyrillic — and nothing else
    assert fold_string("ÀÉÎ") == "àéî"
    assert fold_string("×") == "×"  # U+00D7 skipped
    assert fold_string("ΣΑΛΠΙΓΞ") == "σαλπιγξ"
    # capital sigma -> σ; final sigma ς -> σ as well (unicode.cpp:158-161),
    # so "ΟΣ" and "ος" both fold to "οσ" and compare equal
    assert fold_string("ΟΣ") == "οσ"
    assert fold_string("ς") == "σ"
    assert fold_string("ΟΣ") == fold_string("ος")
    assert fold_string("Ά") == "ά"
    assert fold_string("МИР") == "мир"
    # outside the tables: unchanged (e.g. fullwidth latin, Turkish dotted I)
    assert fold_string("Ｉİ") == "Ｉİ"


def test_winnowing_guarantee():
    """Any shared substring of length >= k + w - 1 yields a shared
    fingerprint (Schleimer et al. winnowing theorem)."""
    k, w = 8, 4
    base = "the quick brown fox jumps over the lazy dog"
    a = "XXXX " + base + " YYYY"
    b = "prefix words " + base + " different tail"
    fa = set(_rolling_fingerprints(a, k, w))
    fb = set(_rolling_fingerprints(b, k, w))
    assert fa & fb, "shared 44-char substring must share a fingerprint"
    # and disjoint strings share nothing
    fc = set(_rolling_fingerprints("0123456789" * 5, k, w))
    assert not (fa & fc)


def test_winnowing_short_strings():
    assert _rolling_fingerprints("short", 8, 4) == []
    assert len(_rolling_fingerprints("exactly8", 8, 4)) == 1


def test_word_shingles_and_contamination(spark):
    """word_shingles: sliding word n-grams, empty below n words;
    contamination_check flags exactly the docs sharing a full n-gram."""
    from pyspark.sql import functions as F
    from text_similarity_node_spark.operators.text_analysis import (
        contamination_check,
        word_shingles,
    )

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "x a b c y"), (4, "c b a d")],
        ["doc_id", "text"],
    )
    from text_similarity_node_spark.functions import columns as C

    got = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", word_shingles(C.word_tokens(F.col("text")), 3).alias("g")
        ).collect()
    }
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []  # below n words -> empty, not a partial gram
    assert got[3] == ["x a b", "a b c", "b c y"]

    bench = df.filter(F.col("doc_id") == 1)
    targets = df.filter(F.col("doc_id") != 1)
    out = {
        r.doc_id: r.n_contaminated_grams
        for r in contamination_check(targets, bench, "doc_id", "text", n=3).collect()
    }
    # doc 3 shares "a b c"; doc 2 has no 3-gram; doc 4 shares no 3-gram
    assert out == {3: 1}

    # non-broadcast fallback is plan-different, result-identical
    out2 = {
        r.doc_id: r.n_contaminated_grams
        for r in contamination_check(
            targets, bench, "doc_id", "text", n=3, broadcast_bench=False
        ).collect()
    }
    assert out2 == out
