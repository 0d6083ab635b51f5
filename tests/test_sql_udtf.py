"""tsn_tokenize UDTF vs the scalar tokenizer (reference parity, SQL surface)."""

from __future__ import annotations

import pytest

from text_similarity_node_spark.config import AlgorithmConfig, Preprocessing
from text_similarity_node_spark.functions.sql_udtf import register_sql_udtfs
from text_similarity_node_spark.functions.tokenize import tokenize


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    assert register_sql_udtfs(spark) == ["tsn_tokenize"]


CASES = [
    ("hello world", "word", 2, True),
    ("Straße küste", "character", 2, False),  # fold + codepoint tokens
    ("ab", "ngram", 3, True),  # len < n -> whole string (reference rule)
    ("the quick brown fox", "ngram", 3, True),
    ("", "word", 2, True),  # empty -> zero rows
    ("MiXeD CaSe", "word", 2, False),
    ("one-token", "none", 2, True),
]


@pytest.mark.parametrize("text,mode,n,cs", CASES)
def test_udtf_matches_scalar_tokenizer(spark, text, mode, n, cs):
    rows = spark.sql(
        "SELECT pos, token FROM tsn_tokenize("
        f"{text!r}, {mode!r}, {n}, {str(cs).lower()}) ORDER BY pos"
    ).collect()
    prep = Preprocessing(mode)
    cfg = AlgorithmConfig(preprocessing=prep, ngram_size=n, case_sensitive=cs)
    expect = tokenize(text, cfg)
    assert [r.token for r in rows] == expect
    assert [r.pos for r in rows] == list(range(len(expect)))


def test_lateral_join_usage(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma beta")], "doc_id int, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    got = {
        (r.doc_id, r.pos, r.token)
        for r in spark.sql(
            "SELECT d.doc_id, t.pos, t.token "
            "FROM udtf_docs d, LATERAL tsn_tokenize(d.text, 'word', 2, true) t"
        ).collect()
    }
    assert got == {
        (1, 0, "alpha"), (1, 1, "beta"),
        (2, 0, "beta"), (2, 1, "gamma"), (2, 2, "beta"),
    }


def test_unknown_mode_raises(spark):
    with pytest.raises(Exception, match="unknown mode"):
        spark.sql("SELECT * FROM tsn_tokenize('x', 'bogus', 2, true)").collect()
