"""Engine API surface parity (index.js convenience wrappers + engine
entry points) — scalar paths, no Spark session needed."""

import json
import subprocess
import sys

import pytest

from text_similarity_node_spark.engine import (
    SimilarityEngine,
    cosine,
    dice,
    jaccard,
    jaro_winkler,
    levenshtein,
    tversky,
)


def test_convenience_wrappers_match_reference_examples():
    assert levenshtein("hello", "hallo") == pytest.approx(0.8)
    assert jaccard("night", "nacht", ngram_size=2) == pytest.approx(1 / 7)
    assert jaccard("a a b", "a b", use_words=True) == 1.0
    assert dice("night", "nacht") >= jaccard("night", "nacht")
    assert cosine("hello world", "world hello", use_words=True) == pytest.approx(1.0)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133333, abs=1e-6)
    assert tversky("night", "nacht", 1.0, 1.0) == pytest.approx(
        jaccard("night", "nacht")
    )


def test_engine_configure_immutable():
    e1 = SimilarityEngine()
    e2 = e1.configure(algorithm="jaccard", preprocessing="ngram", ngram_size=3)
    assert e1.get_configuration().algorithm.value == "levenshtein"
    assert e2.get_configuration().algorithm.value == "jaccard"
    assert e2.similarity("abc", "abc") == 1.0


def test_engine_batch_error_channel():
    e = SimilarityEngine().configure(algorithm="hamming")
    out = e.similarity_batch([("abc", "abd"), ("abc", "ab")])
    assert out[0] == pytest.approx(2 / 3)
    assert out[1] is None  # unequal length -> error channel, not exception


def test_cli_surface():
    def run(*args):
        return subprocess.run(
            [sys.executable, "cli.py", *args], capture_output=True, text=True,
            cwd=__file__.rsplit("/tests/", 1)[0],
        )

    r = run("similarity", "hello", "hallo")
    assert r.returncode == 0 and r.stdout.strip() == "0.8"
    r = run("distance", "kitten", "sitting", "--json")
    assert json.loads(r.stdout) == {
        "success": True, "result": 3, "algorithm": "levenshtein"
    }
    r = run("similarity", "x", "y", "-a", "tversky")
    assert r.returncode == 1 and json.loads(r.stdout)["success"] is False
    r = run("algorithms")
    assert len(r.stdout.split()) == 13


def test_register_sql_functions(spark):
    """Every kernel callable from plain SQL, same values as the scalar
    kernels (the reference's index.js surface reached via spark.sql)."""
    from text_similarity_node_spark.config import Algorithm, AlgorithmConfig
    from text_similarity_node_spark.engine import register_sql_functions
    from text_similarity_node_spark.functions import kernels

    names = register_sql_functions(spark)
    assert len(names) == 27  # 13 kernels x {sim, dist} + tsn_tokenize UDTF
    df = spark.sql(
        "SELECT tsn_sim_levenshtein('hello', 'hallo') AS a,"
        "       tsn_dist_levenshtein('kitten', 'sitting') AS b,"
        "       tsn_sim_jaccard('night day', 'day night') AS c,"
        "       tsn_sim_tversky('abc', 'abd') AS d"
    ).collect()[0]
    assert df.a == 0.8
    assert df.b == 3.0
    cfgj = AlgorithmConfig(algorithm=Algorithm.JACCARD)
    assert df.c == kernels.similarity("night day", "day night", cfgj)
    cfgt = AlgorithmConfig(algorithm=Algorithm.TVERSKY, alpha=0.5, beta=0.5)
    assert df.d == kernels.similarity("abc", "abd", cfgt)

    # overrides fix the config for a second registration under a prefix
    register_sql_functions(spark, prefix="tsnci", case_sensitive=False)
    r = spark.sql("SELECT tsnci_sim_levenshtein('HELLO', 'hello') AS v").collect()[0]
    assert r.v == 1.0
