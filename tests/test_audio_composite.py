"""Composite pitch x stretch x echo tier (operators/audio_composite.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio import echo_pcm_udf
from text_similarity_node_spark.operators.audio_composite import (
    composite_pairs,
    planted_stretch_pct,
    synth_composite_pcm_udf,
    top3_bands,
    top3_concentration,
    top3_struct,
)
from text_similarity_node_spark.operators.audio_pitch import (
    planted_shift,
    semitone_profile_udf,
)

SR = 16000


def _echoed_corpus(spark, n, n_classes=200):
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    copies = base.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id")
    )
    synth = synth_composite_pcm_udf(n_classes=n_classes)
    return (
        base.unionByName(copies)
        .withColumn("bytes", synth(F.col("doc_id")))
        .withColumn(
            "bytes",
            F.when(
                F.col("doc_id") >= 1_000_000, echo_pcm_udf()(F.col("bytes"))
            ).otherwise(F.col("bytes")),
        )
        .withColumn("sr_hz", F.lit(SR))
    )


def test_membership_survives_all_three_transforms(spark):
    """A stretched + shifted + echoed copy's top-3 band triple is the
    base triple translated by exactly k, and concentration stays high
    on both sides — the two statistics the verify rests on."""
    # source 48: k = +4, stretch j = (8 % 3) - 1 = +1 -> +1.5%
    d_src, d_copy = 48, 1_000_048
    df = _echoed_corpus(spark, 49)
    prof = df.filter(F.col("doc_id").isin(d_src, d_copy)).select(
        "doc_id",
        top3_struct(
            semitone_profile_udf()(F.col("bytes"), F.col("sr_hz"))
        ).alias("t3"),
    ).select(
        "doc_id",
        top3_bands(F.col("t3")).alias("bands"),
        top3_concentration(F.col("t3")).alias("conc"),
    )
    rows = {r.doc_id: r for r in prof.collect()}
    b_src = list(rows[d_src].bands)
    b_cpy = list(rows[d_copy].bands)
    k = planted_shift(d_copy)
    assert planted_stretch_pct(d_copy) != 0.0  # the stretch axis is live
    assert b_cpy == [b + k for b in b_src]
    assert rows[d_src].conc > 0.95 and rows[d_copy].conc > 0.9


def test_concentration_gate_rejects_noise(spark):
    """60-band noise has low top-3 concentration: colliding keys from
    noise-floor clips cannot pass the verify."""
    rng = np.random.RandomState(7)
    noise = (rng.randn(SR) * 2000).clip(-32768, 32767).astype("<i2").tobytes()
    df = spark.createDataFrame([(0, noise)], ["doc_id", "bytes"]).withColumn(
        "sr_hz", F.lit(SR)
    )
    conc = df.select(
        top3_concentration(
            top3_struct(
                semitone_profile_udf()(F.col("bytes"), F.col("sr_hz"))
            )
        ).alias("c")
    ).collect()[0].c
    assert conc < 0.5


def test_end_to_end_recall_precision_and_shift(spark):
    """n >= 660 so copy-copy same-class pairs exist including the
    worst-case |Dk| = 8 at sources (48, 648) — both copies also carry
    different planted stretches, and every copy is echoed.  Recall,
    precision, and the recovered shift must all be exact."""
    n, n_classes = 660, 200
    df = _echoed_corpus(spark, n, n_classes)
    got = {
        (r.id1, r.id2): r.shift_semitones
        for r in composite_pairs(df, "doc_id", "bytes", max_shift=8).collect()
    }
    ids = list(range(n)) + [1_000_000 + d for d in range(0, n, 6)]
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if a % n_classes == b % n_classes
    }
    assert set(got) == truth
    for (a, b), s in got.items():
        assert s == planted_shift(b) - planted_shift(a)
    # the worst-case copy-copy pair: |Dk| = 8 plus unequal stretches
    assert got[(1_000_048, 1_000_648)] == -8
    assert planted_stretch_pct(1_000_048) != planted_stretch_pct(1_000_648)


def test_hot_key_cap_metered(spark):
    """key_cap drops runaway keys WITH metrics, never silently."""
    n = 30  # all one class -> one hot key
    df = (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "bytes",
            synth_composite_pcm_udf(n_classes=1)(F.col("doc_id") * 0),
        )
        .withColumn("sr_hz", F.lit(SR))
    )
    pairs, hot = composite_pairs(
        df, "doc_id", "bytes", key_cap=5, return_metrics=True
    )
    hot_rows = hot.collect()
    assert len(hot_rows) == 1 and hot_rows[0].n_docs == n
    assert pairs.count() == 0
