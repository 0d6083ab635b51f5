"""Pitch-shift-robust audio tier (operators/audio_pitch.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from text_similarity_node_spark.operators.audio_pitch import (
    audio_pitch_pairs,
    best_shift_cosine,
    pitch_class_bands,
    planted_shift,
    semitone_profile_udf,
    shift_invariant_key,
    synth_pitch_pcm_udf,
)

SR = 16000


def _chord_bytes(bands, k=0, f_lo=200.0, amps=(1.0, 0.62, 0.38), phase=0.0):
    t = np.arange(SR) / SR
    x = np.zeros(SR)
    for amp, band in zip(amps, bands):
        freq = round(f_lo * 2.0 ** ((band + 0.5 + k) / 12.0))
        x += amp * np.sin(2 * np.pi * freq * t + phase)
    return np.clip(x / 2.2 * 32767.0, -32768, 32767).astype("<i2").tobytes()


def test_profile_translation_under_pitch_shift(spark):
    """A k-semitone shift translates the semitone band profile by k slots."""
    rows = [(0, _chord_bytes((10, 20, 33))), (1, _chord_bytes((10, 20, 33), k=3))]
    df = spark.createDataFrame(rows, ["doc_id", "bytes"]).withColumn(
        "sr_hz", F.lit(SR)
    )
    prof = {
        r.doc_id: np.array(r.p)
        for r in df.select(
            "doc_id", semitone_profile_udf()(F.col("bytes"), F.col("sr_hz")).alias("p")
        ).collect()
    }
    p0, p1 = prof[0], prof[1]
    # dominant bands move by exactly 3
    assert set(np.argsort(p1)[-3:]) == {b + 3 for b in (10, 20, 33)}
    # translated overlap is nearly identical
    ncc = float(np.dot(p0[:-3], p1[3:]) / (np.linalg.norm(p0[:-3]) * np.linalg.norm(p1[3:])))
    assert ncc > 0.999


def test_invariant_key_is_shift_invariant(spark):
    """Same chord at every shift in [-4, 4] -> identical inv_key."""
    rows = [(k + 4, _chord_bytes((12, 19, 40), k=k)) for k in range(-4, 5)]
    df = spark.createDataFrame(rows, ["doc_id", "bytes"]).withColumn(
        "sr_hz", F.lit(SR)
    )
    keys = (
        df.select(
            shift_invariant_key(
                semitone_profile_udf()(F.col("bytes"), F.col("sr_hz"))
            ).alias("k")
        )
        .distinct()
        .collect()
    )
    assert len(keys) == 1
    assert keys[0].k == (19 - 12) * 4096 + (40 - 12)


def test_best_shift_cosine_recovers_lag_and_tiebreak(spark):
    """Argmax lag equals the planted translation; an ambiguous flat pair
    resolves to the smallest |shift| deterministically."""
    p1 = [0.0] * 60
    p2 = [0.0] * 60
    for b in (10, 20, 33):
        p1[b] = 1.0
        p2[b - 2] = 1.0  # clip 2 sits 2 semitones LOWER
    flat = [1.0] * 60
    df = spark.createDataFrame(
        [(p1, p2), (flat, flat)],
        T.StructType(
            [
                T.StructField("a", T.ArrayType(T.DoubleType())),
                T.StructField("b", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    out = df.select(
        best_shift_cosine(F.col("a"), F.col("b"), 60, 4).alias("r")
    ).collect()
    assert out[0].r.shift == -2 and out[0].r.cos_sim > 0.999
    # flat-vs-flat: every lag gives ncc 1.0 -> tie resolves to shift 0
    assert out[1].r.shift == 0 and out[1].r.cos_sim > 0.999


def test_planted_shift_closed_form():
    assert planted_shift(42) == 0
    # copies: k = ((d/6) % 9) - 4
    for d in range(0, 600, 6):
        assert planted_shift(1_000_000 + d) == (d // 6) % 9 - 4


def test_class_bands_never_transpositions():
    """No two classes share the difference pattern, so no cross-class
    candidate key collision and no cross-class alignment at any lag."""
    pats = set()
    for c in range(200):
        b1, b2, b3 = pitch_class_bands(c)
        assert 2 <= b1 - 4 and b3 + 4 < 60  # stays in range at max shift
        pats.add((b2 - b1, b3 - b1))
    assert len(pats) == 200


def test_end_to_end_recall_precision_and_shift(spark):
    # n >= 660 so COPY-COPY same-class pairs exist (d' - d must be a
    # multiple of lcm-ish 300: (0,300), (48,648), ...) including the
    # worst case |Dk| = 8 at (48, 648) — the pair a [-4,4] search window
    # provably drops.  max_shift=8 (2x the per-clip planted range) is
    # therefore the correct production setting for any corpus where two
    # COPIES of one class can meet, and is what q121 ships.
    n, n_classes = 660, 100
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    copies = base.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id")
    )
    synth = synth_pitch_pcm_udf(n_classes=n_classes)
    corpus = (
        base.unionByName(copies)
        .withColumn("bytes", synth(F.col("doc_id")))
        .withColumn("sr_hz", F.lit(SR))
    )
    got = {
        (r.id1, r.id2): r.shift_semitones
        for r in audio_pitch_pairs(
            corpus, "doc_id", "bytes", max_shift=8
        ).collect()
    }
    ids = list(range(n)) + [1_000_000 + d for d in range(0, n, 6)]
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if a % n_classes == b % n_classes
    }
    assert set(got) == truth  # recall and precision both 1.0
    for (a, b), s in got.items():
        assert s == planted_shift(b) - planted_shift(a)
    # the worst-case copy-copy pair is actually in the corpus and found
    assert got[(1_000_048, 1_000_648)] == -8


def test_hot_key_cap_metered(spark):
    """key_cap drops runaway keys WITH metrics, never silently."""
    n = 30  # all one class -> one hot key with 30 members
    df = (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "bytes", synth_pitch_pcm_udf(n_classes=1)(F.col("doc_id") * 0)
        )
        .withColumn("doc_id", F.col("doc_id"))
        .withColumn("sr_hz", F.lit(SR))
    )
    pairs, hot = audio_pitch_pairs(
        df, "doc_id", "bytes", key_cap=5, return_metrics=True
    )
    hot_rows = hot.collect()
    assert len(hot_rows) == 1 and hot_rows[0].n_docs == n
    assert pairs.count() == 0
