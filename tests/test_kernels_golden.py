"""Golden kernel tests — the reference's own test values.

Mirrors ``/root/reference/tests/api.test.js`` scalar assertions and the
fixed corpus of ``/root/reference/tests/verify_algorithms.py:78-107``
(FIXTURES.md §2).  Expected values are hard-coded (no textdistance in this
environment); each is derivable by hand from the reference formulae.
"""

import math

import pytest

from text_similarity_node_spark import Algorithm, AlgorithmConfig, Preprocessing
from text_similarity_node_spark.functions.kernels import (
    KernelError,
    distance,
    similarity,
)

CHAR = AlgorithmConfig(preprocessing=Preprocessing.CHARACTER)


def cfg(algo, **kw):
    return AlgorithmConfig(algorithm=algo, **kw)


# --- api.test.js golden scalars -------------------------------------------


def test_levenshtein_hello_hallo():
    # api.test.js:32-42 — sim 0.8, dist 1
    assert similarity("hello", "hallo", cfg(Algorithm.LEVENSHTEIN)) == pytest.approx(0.8)
    assert distance("hello", "hallo", cfg(Algorithm.LEVENSHTEIN)) == 1


def test_levenshtein_kitten_sitting():
    # api.test.js:106-115 — dist 3
    assert distance("kitten", "sitting", cfg(Algorithm.LEVENSHTEIN)) == 3
    assert similarity("kitten", "sitting", cfg(Algorithm.LEVENSHTEIN)) == pytest.approx(
        1 - 3 / 7
    )


def test_hamming_hello_hallo():
    assert distance("hello", "hallo", cfg(Algorithm.HAMMING)) == 1
    assert similarity("hello", "hallo", cfg(Algorithm.HAMMING)) == pytest.approx(0.8)


def test_hamming_unequal_length_errors():
    # api.test.js:486-492
    with pytest.raises(KernelError):
        similarity("hello", "hi", cfg(Algorithm.HAMMING))
    with pytest.raises(KernelError):
        distance("abc", "ab", cfg(Algorithm.HAMMING))


def test_hamming_quick_answers_bypass_length_check():
    # quick answers fire before compute (base_algorithm.cpp:16-50): one-empty
    # returns 0.0 / len(other) even though lengths differ.
    assert similarity("", "abc", cfg(Algorithm.HAMMING)) == 0.0
    assert distance("", "abc", cfg(Algorithm.HAMMING)) == 3


def test_word_cosine_permutation_invariance():
    # api.test.js:60-72 — "hello world" vs "world hello" = 1.0
    c = cfg(Algorithm.COSINE, preprocessing=Preprocessing.WORD)
    assert similarity("hello world", "world hello", c) == pytest.approx(1.0)


def test_damerau_transposition():
    c = cfg(Algorithm.DAMERAU_LEVENSHTEIN)
    lev = cfg(Algorithm.LEVENSHTEIN)
    assert distance("abcdef", "abcedf", c) == 1
    assert distance("abcdef", "abcedf", lev) == 2
    assert distance("abcdef", "abcedf", c) <= distance("abcdef", "abcedf", lev)


def test_dice_ge_jaccard():
    # api.test.js:518-539 property on a concrete pair
    jac = cfg(Algorithm.JACCARD, preprocessing=Preprocessing.NGRAM, ngram_size=2)
    dic = cfg(Algorithm.SORENSEN_DICE, preprocessing=Preprocessing.NGRAM, ngram_size=2)
    s = similarity("hello world", "hello earth", jac)
    d = similarity("hello world", "hello earth", dic)
    assert d >= s


def test_jaro_martha_marhta():
    # classic Jaro value 0.9444…
    assert similarity("martha", "marhta", cfg(Algorithm.JARO)) == pytest.approx(
        0.9444444444, abs=1e-6
    )


def test_jaro_winkler_dixon():
    # jaro(DIXON, DICKSONX) = 0.76667; boost: prefix 2 chars, p=0.1
    jw = similarity("DIXON", "DICKSONX", cfg(Algorithm.JARO_WINKLER))
    assert jw == pytest.approx(0.8133333333, abs=1e-6)


def test_jaro_winkler_boost_gated_on_threshold():
    # phonetic.cpp:180-184: no boost when jaro < 0.7
    lo = cfg(Algorithm.JARO_WINKLER)
    j = similarity("abcdef", "uvwxyz", cfg(Algorithm.JARO))
    assert similarity("abcdef", "uvwxyz", lo) == pytest.approx(j)


def test_tversky_requires_alpha_beta():
    # api.test.js:453-466
    with pytest.raises((KernelError, ValueError)):
        similarity("hello", "hallo", cfg(Algorithm.TVERSKY))


def test_tversky_equals_jaccard_at_alpha_beta_one():
    t = cfg(Algorithm.TVERSKY, preprocessing=Preprocessing.NGRAM, ngram_size=2,
            alpha=1.0, beta=1.0)
    j = cfg(Algorithm.JACCARD, preprocessing=Preprocessing.NGRAM, ngram_size=2)
    assert similarity("night", "nacht", t) == pytest.approx(similarity("night", "nacht", j))


def test_max_string_length():
    # >100KB rejected; maxStringLength override accepted (api.test.js:252-306)
    big = "a" * 100_001
    with pytest.raises(KernelError):
        similarity(big, "a", cfg(Algorithm.LEVENSHTEIN))
    ok = cfg(Algorithm.LEVENSHTEIN, max_string_length=200_000)
    assert similarity(big, big, ok) == 1.0


# --- quick answers (base_algorithm.cpp:243-319) -----------------------------

ALL_ALGOS = [
    (Algorithm.LEVENSHTEIN, {}),
    (Algorithm.DAMERAU_LEVENSHTEIN, {}),
    (Algorithm.HAMMING, {}),
    (Algorithm.JARO, {}),
    (Algorithm.JARO_WINKLER, {}),
    (Algorithm.JACCARD, {}),
    (Algorithm.SORENSEN_DICE, {}),
    (Algorithm.OVERLAP, {}),
    (Algorithm.TVERSKY, {"alpha": 1.0, "beta": 1.0}),
    (Algorithm.COSINE, {}),
    (Algorithm.EUCLIDEAN, {}),
    (Algorithm.MANHATTAN, {}),
    (Algorithm.CHEBYSHEV, {}),
]


@pytest.mark.parametrize("algo,kw", ALL_ALGOS)
def test_quick_answers(algo, kw):
    c = cfg(algo, **kw)
    assert similarity("", "", c) == 1.0
    assert distance("", "", c) == 0
    assert similarity("", "hello", c) == 0.0
    assert distance("", "hello", c) == 5  # codepoint length, NOT x1000
    assert distance("hello", "", c) == 5
    assert similarity("hello", "hello", c) == 1.0
    assert distance("hello", "hello", c) == 0


@pytest.mark.parametrize("algo,kw", ALL_ALGOS)
def test_case_insensitive_quick_identity(algo, kw):
    c = cfg(algo, case_sensitive=False, **kw)
    assert similarity("Hello", "hELLo", c) == 1.0
    assert distance("Hello", "hELLo", c) == 0


# --- unicode corpus ---------------------------------------------------------


def test_unicode_levenshtein():
    assert distance("café", "cafe", cfg(Algorithm.LEVENSHTEIN)) == 1
    assert distance("日本語", "日本", cfg(Algorithm.LEVENSHTEIN)) == 1
    assert distance("αβγ", "αβδ", cfg(Algorithm.LEVENSHTEIN)) == 1
    assert distance("привет", "превет", cfg(Algorithm.LEVENSHTEIN)) == 1


def test_unicode_case_fold_greek_cyrillic():
    c = cfg(Algorithm.LEVENSHTEIN, case_sensitive=False)
    assert similarity("ΑΒΓ", "αβγ", c) == 1.0
    assert similarity("ПРИВЕТ", "привет", c) == 1.0
    # final sigma folds to sigma in the table fold (unicode.cpp:158-161)
    assert similarity("ΟΣ", "ος", c) == 1.0


def test_emoji_pairs():
    assert distance("hello 😀", "hello 😃", cfg(Algorithm.LEVENSHTEIN)) == 1
    # emoji are single codepoints in the u32 model
    assert distance("", "😀😃", cfg(Algorithm.LEVENSHTEIN)) == 2


def test_stress_long_string():
    a = "a" * 10_000
    b = "a" * 9_999 + "b"
    assert distance(a, b, cfg(Algorithm.LEVENSHTEIN)) == 1
    assert similarity(a, b, cfg(Algorithm.LEVENSHTEIN)) == pytest.approx(0.9999)


# --- mode semantics ---------------------------------------------------------


def test_jaccard_set_vs_multiset():
    # WORD mode is set-based: repeated words collapse (token_based.cpp:17-29)
    w = cfg(Algorithm.JACCARD, preprocessing=Preprocessing.WORD)
    assert similarity("a a b", "a b", w) == 1.0
    # CHARACTER mode is multiset: counts matter (token_based.cpp:30-43)
    ch = cfg(Algorithm.JACCARD, preprocessing=Preprocessing.CHARACTER)
    # "aab" vs "ab": inter = min-counts = {a:1->? a:2/1 -> 1, b:1} = 2; union = max = {a:2,b:1} = 3
    assert similarity("aab", "ab", ch) == pytest.approx(2 / 3)


def test_ngram_short_string_rule():
    # len(s) < n -> whole string is the single shingle (base_algorithm.cpp:192-196)
    c = cfg(Algorithm.JACCARD, preprocessing=Preprocessing.NGRAM, ngram_size=5)
    assert similarity("abc", "abc", c) == 1.0
    assert similarity("abc", "abd", c) == 0.0  # {"abc"} vs {"abd"}


def test_distance_x1000_scaling():
    # fractional metrics ride the integer channel x1000 (token_based.cpp:62-64)
    c = cfg(Algorithm.JACCARD, preprocessing=Preprocessing.NGRAM, ngram_size=2)
    sim = similarity("night", "nacht", c)
    assert distance("night", "nacht", c) == round((1 - sim) * 1000)


def test_cosine_char_ascii_vs_nonascii_fork():
    # ASCII pair -> frequency cosine; non-ASCII -> binary presence
    # (vector_based.cpp:33-48,125-159)
    c = cfg(Algorithm.COSINE, preprocessing=Preprocessing.CHARACTER)
    # ASCII frequency: "aab" vs "ab" -> dot=2*1+1*1=3, |a|=sqrt(5), |b|=sqrt(2)
    assert similarity("aab", "ab", c) == pytest.approx(3 / math.sqrt(10))
    # non-ASCII binary: "ééa" vs "éa" -> sets equal -> 1.0 despite counts
    assert similarity("ééa", "éa", c) == pytest.approx(1.0)


def test_lnorm_similarity_quantized_through_integer_channel():
    # sim = f(round(d*1000)/1000) (vector_based.cpp:260-323)
    c = cfg(Algorithm.EUCLIDEAN, preprocessing=Preprocessing.CHARACTER)
    d_int = distance("abc", "abd", c)  # raw sqrt(2) -> 1414
    assert d_int == 1414
    assert similarity("abc", "abd", c) == pytest.approx(math.exp(-1.414))
    m = cfg(Algorithm.MANHATTAN, preprocessing=Preprocessing.CHARACTER)
    assert distance("abc", "abd", m) == 2000
    assert similarity("abc", "abd", m) == pytest.approx(1 / 3)
    ch = cfg(Algorithm.CHEBYSHEV, preprocessing=Preprocessing.CHARACTER)
    assert distance("abc", "abd", ch) == 1000
    assert similarity("abc", "abd", ch) == pytest.approx(math.exp(-1.0))


def test_levenshtein_threshold_band_nonascii():
    # threshold banding caps the distance at t+1 (levenshtein.cpp:168-246);
    # ASCII pairs bypass the band (levenshtein.cpp:85-99) — use non-ASCII.
    c = cfg(Algorithm.LEVENSHTEIN, threshold=2.0)
    assert distance("日本語です", "全然違う文", c) == 3  # capped at threshold+1
    assert distance("日本語です", "日本語だよ", c) == 2  # within band: exact


def test_ascii_pipe_0x20_quirk():
    # case-insensitive ASCII compare uses c|0x20: '@' == '`' (levenshtein.cpp:19-22)
    c = cfg(Algorithm.LEVENSHTEIN, case_sensitive=False)
    assert distance("a@b", "a`b", c) == 0
    s = cfg(Algorithm.LEVENSHTEIN, case_sensitive=True)
    assert distance("a@b", "a`b", s) == 1
