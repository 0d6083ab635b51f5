"""Unit coverage for the banded-Levenshtein column, the vectorized
signature-agreement prefilter, and the deterministic PCM synth UDF."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.functions import columns as C


def _sim_rows(spark, pairs, col):
    df = spark.createDataFrame(pairs, "s1 string, s2 string")
    return [r[0] for r in df.select(col(F.col("s1"), F.col("s2"))).collect()]


def test_banded_levenshtein_matches_full_within_band(spark):
    pairs = [
        ("hello", "hallo"),
        ("kitten", "sitting"),
        ("abcdef", "abcdef"),
        ("", ""),
        ("", "abc"),
    ]
    full = _sim_rows(spark, pairs, C.levenshtein_similarity)
    banded = _sim_rows(
        spark, pairs, lambda a, b: C.levenshtein_similarity_banded(a, b, 10)
    )
    assert full == pytest.approx(banded)


def test_banded_levenshtein_rejects_beyond_band(spark):
    # d("aaaa...", "bbbb...") = 20 > band 3 -> sim coerced to 0.0, which any
    # `sim >= tau` predicate with band >= (1-tau)*len would have rejected
    rows = _sim_rows(
        spark,
        [("a" * 20, "b" * 20)],
        lambda a, b: C.levenshtein_similarity_banded(a, b, 3),
    )
    assert rows == [0.0]


def test_signature_agreement_vectorized(spark):
    from text_similarity_node_spark.operators.minhash import signature_agreement_udf

    df = spark.createDataFrame(
        [
            ([1, 2, 3, 4], [1, 2, 3, 4]),
            ([1, 2, 3, 4], [1, 2, 0, 0]),
            ([1, 2, 3, 4], [0, 0, 0, 0]),
            (None, [1, 2, 3, 4]),
        ],
        "s1 array<bigint>, s2 array<bigint>",
    )
    got = [r[0] for r in df.select(signature_agreement_udf("s1", "s2")).collect()]
    assert got == pytest.approx([1.0, 0.5, 0.0, 0.0])


def test_signature_agreement_col_matches_udf(spark):
    from text_similarity_node_spark.operators.minhash import (
        signature_agreement_col,
        signature_agreement_udf,
    )

    df = spark.createDataFrame(
        [([1, 2, 3, 4], [1, 2, 3, 4]), ([1, 2, 3, 4], [4, 2, 3, 0]),
         ([5, 6, 7, 8], [0, 0, 0, 0])],
        "s1 array<bigint>, s2 array<bigint>",
    )
    got = df.select(
        signature_agreement_col(F.col("s1"), F.col("s2"), 4).alias("c"),
        signature_agreement_udf("s1", "s2").alias("u"),
    ).collect()
    for r in got:
        assert r.c == pytest.approx(r.u)


def test_minhash_agreement_col_matches_positional_on_signatures(spark):
    """On REAL minhash signatures (distinct splitmix64 slot values) the
    value-intersection estimator equals positional agreement.

    PRECONDITION under test: signatures contain no duplicate slot values —
    real signatures satisfy this, the all-(-1) sentinel does not (its
    value-intersection score is 1/k vs positional 1.0).  Sentinels bypass
    the estimator entirely (prefilter_candidates passes them through; see
    test_prefilter_sentinel_bypass)."""
    from text_similarity_node_spark.config import PipelineConfig
    from text_similarity_node_spark.operators.minhash import (
        minhash_agreement_col,
        signature_agreement_col,
        with_minhash,
    )

    cfg = PipelineConfig()
    docs = spark.createDataFrame(
        [(i, [f"tok{j}" for j in range(i, i + 40)]) for i in range(0, 60, 3)],
        "rid long, tokens array<string>",
    )
    sig = with_minhash(docs, "tokens", cfg)
    a = sig.select(F.col("rid").alias("r1"), F.col("minhash").alias("s1"))
    b = sig.select(F.col("rid").alias("r2"), F.col("minhash").alias("s2"))
    pairs = a.join(b, F.col("r1") < F.col("r2"))
    rows = pairs.select(
        minhash_agreement_col(F.col("s1"), F.col("s2"), cfg.minhash_k).alias("v"),
        signature_agreement_col(F.col("s1"), F.col("s2"), cfg.minhash_k).alias("p"),
    ).collect()
    assert rows
    for r in rows:
        assert r.v == pytest.approx(r.p)


def test_synth_pcm_deterministic_and_decodable(spark):
    from text_similarity_node_spark.operators.audio import (
        decode_pcm_s16le,
        synth_sine_pcm_udf,
    )

    df = spark.range(3).select(
        F.col("id"), synth_sine_pcm_udf(F.col("id")).alias("bytes")
    )
    rows = {r["id"]: bytes(r["bytes"]) for r in df.collect()}
    for i, payload in rows.items():
        assert len(payload) == 1600  # 800 samples * 2 bytes
        x = decode_pcm_s16le(payload)
        freq = 100.0 + (i % 400)
        expect = np.trunc(
            16384.0 * np.sin(2.0 * np.pi * freq * np.arange(800) / 16000.0)
        ) / 32768.0
        assert np.allclose(x, expect, atol=1e-12)
    # a second invocation produces byte-identical payloads
    rows2 = {r["id"]: bytes(r["bytes"]) for r in df.collect()}
    assert rows == rows2


def _prefilter_fixture(spark, docs_rows, pair_rows):
    from text_similarity_node_spark.config import PipelineConfig
    from text_similarity_node_spark.operators import minhash

    cfg = PipelineConfig(verify_threshold=0.9)
    docs = spark.createDataFrame(docs_rows, "clip_id string, tokens array<string>")
    n_distinct, n_total = minhash.token_stats_cols(F.col("tokens"))
    sig = (
        minhash.with_minhash(docs, "tokens", cfg)
        .withColumn("n_distinct", n_distinct)
        .withColumn("n_total", n_total)
    )
    pairs = spark.createDataFrame(pair_rows, "id1 string, id2 string")
    kept = minhash.prefilter_candidates(
        pairs, sig.select("clip_id", "minhash", "n_distinct", "n_total"), cfg
    )
    return {(r.id1, r.id2) for r in kept.collect()}


def test_prefilter_keeps_repeated_gram_true_positive(spark):
    """Regression for the set-vs-multiset gap: A={a x100,b}, B={a x100,c}
    has multiset J = 100/102 ~ 0.98 (passes verify at 0.9) but set J = 1/3
    — a flat set-space gate (0.9 - 0.25 = 0.65) silently drops the true
    positive.  The sound bound M/(T1+T2-M) with M = c + min(T-s) evaluates
    to ~0.99 here and must keep it."""
    a = ["a"] * 100 + ["b"]
    b = ["a"] * 100 + ["c"]
    kept = _prefilter_fixture(spark, [("A", a), ("B", b)], [("A", "B")])
    assert ("A", "B") in kept


def test_prefilter_still_drops_unrelated_pairs(spark):
    """Repeat-free unrelated docs (T == s, true set-J 0) must still be
    dropped — the repetition allowance must not neuter the filter."""
    a = [f"x{i}" for i in range(50)]
    b = [f"y{i}" for i in range(50)]
    kept = _prefilter_fixture(spark, [("A", a), ("B", b)], [("A", "B")])
    assert kept == set()


def test_prefilter_sentinel_bypass(spark):
    """Empty-token docs carry the all-(-1) sentinel signature, which the
    value-intersection estimator mis-scores (1/k); such pairs must bypass
    the prefilter and reach the exact verify."""
    kept = _prefilter_fixture(
        spark,
        [("A", []), ("B", ["a", "b", "c"]), ("C", [])],
        [("A", "B"), ("A", "C")],
    )
    assert kept == {("A", "B"), ("A", "C")}
