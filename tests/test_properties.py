"""Property-based kernel tests (hypothesis) — the algebraic relations the
reference's own suite asserts (api.test.js:496-539) plus metric axioms."""

from hypothesis import given, settings
from hypothesis import strategies as st

from text_similarity_node_spark.config import Algorithm, AlgorithmConfig, Preprocessing
from text_similarity_node_spark.functions.kernels import distance, similarity

TEXT = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=40)
SHORT = st.text(alphabet="abcdef ", max_size=25)


def cfg(algo, **kw):
    return AlgorithmConfig(algorithm=algo, **kw)


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_damerau_le_levenshtein(a, b):
    assert distance(a, b, cfg(Algorithm.DAMERAU_LEVENSHTEIN)) <= distance(
        a, b, cfg(Algorithm.LEVENSHTEIN)
    )


@settings(max_examples=200, deadline=None)
@given(SHORT, SHORT)
def test_dice_ge_jaccard(a, b):
    n = cfg(Algorithm.SORENSEN_DICE, preprocessing=Preprocessing.NGRAM)
    j = cfg(Algorithm.JACCARD, preprocessing=Preprocessing.NGRAM)
    assert similarity(a, b, n) >= similarity(a, b, j) - 1e-12


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_similarity_bounds_and_symmetry(a, b):
    for algo in (
        Algorithm.LEVENSHTEIN,
        Algorithm.JARO,
        Algorithm.JACCARD,
        Algorithm.COSINE,
        Algorithm.EUCLIDEAN,
    ):
        c = cfg(algo, preprocessing=Preprocessing.NGRAM)
        s_ab = similarity(a, b, c)
        assert 0.0 <= s_ab <= 1.0
        assert abs(s_ab - similarity(b, a, c)) < 1e-12


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_self_similarity_is_one(a):
    for algo in Algorithm:
        kw = {"alpha": 1.0, "beta": 1.0} if algo == Algorithm.TVERSKY else {}
        c = cfg(algo, preprocessing=Preprocessing.NGRAM, **kw)
        assert similarity(a, a, c) == 1.0
        assert distance(a, a, c) == 0


@settings(max_examples=150, deadline=None)
@given(SHORT, SHORT)
def test_levenshtein_triangle_via_empty(a, b):
    c = cfg(Algorithm.LEVENSHTEIN)
    # d(a,b) <= d(a,"") + d("",b) = len(a) + len(b)
    assert distance(a, b, c) <= len(a) + len(b)
    # d(a,b) >= |len(a) - len(b)|
    assert distance(a, b, c) >= abs(len(a) - len(b))


@settings(max_examples=150, deadline=None)
@given(SHORT, SHORT)
def test_case_insensitive_ge_sensitive_similarity(a, b):
    # folding can only merge characters -> lev distance can't grow
    s = distance(a, b, cfg(Algorithm.LEVENSHTEIN, case_sensitive=True))
    i = distance(a, b, cfg(Algorithm.LEVENSHTEIN, case_sensitive=False))
    assert i <= s
