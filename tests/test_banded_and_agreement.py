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
