"""Tiered audio dedup cascade (operators/audio_cascade.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio_cascade import (
    audio_dedup_cascade,
    cascade_pitch_shift,
    cascade_transform,
    default_audio_tiers,
    exact_star_pairs,
    landmark_snr_pairs,
    semitone_dtw_pairs,
    synth_cascade_pcm_udf,
)

SR = 16000


def _corpus(spark, n_docs=60, n_classes=200):
    """Base ids 0..n_docs-1 plus the planted copies (src < 200, src%4==0)."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    copies = base.filter(
        (F.col("doc_id") < 200) & (F.col("doc_id") % 4 == 0)
    ).select((F.col("doc_id") + 1_000_000).alias("doc_id"))
    synth = synth_cascade_pcm_udf(n_classes=n_classes)
    return (
        base.unionByName(copies)
        .withColumn("bytes", synth(F.col("doc_id")))
        .withColumn("sr_hz", F.lit(SR))
        .persist()
    )


def test_transform_and_shift_closed_forms():
    assert [cascade_transform(s) for s in (0, 4, 8, 12, 16)] == [0, 1, 2, 3, 0]
    ks = {cascade_pitch_shift(s) for s in range(0, 200, 4)}
    assert 0 not in ks
    assert ks <= set(range(-4, 5))


def test_tier_capability_matrix(spark):
    """Each transform is caught by exactly the intended tier's pair fn
    (and produces nothing at the earlier tiers) — the blindness claims
    the cascade's attribution rests on."""
    corpus = _corpus(spark, n_docs=20)
    # transforms present: src 0 exact, 4 gain, 8 warp, 12 pitch, 16 exact
    exact = {tuple(r) for r in exact_star_pairs(corpus, "doc_id", "bytes")
             .select("id1", "id2").collect()}
    assert (0, 1_000_000) in exact and (16, 1_000_016) in exact
    assert not any(i2 in (1_000_004, 1_000_008, 1_000_012) for _, i2 in exact)

    lm = {tuple(r) for r in landmark_snr_pairs(
        corpus, "doc_id", "bytes",
        frame_len=4096, hop=2048, peaks_per_frame=3, fanout=2,
        freq_quant_hz=1.0,
    ).collect()}
    assert (4, 1_000_004) in lm          # gain caught here
    assert not any(i2 in (1_000_008, 1_000_012) for _, i2 in lm)  # warp/pitch not

    dtw = {tuple(r) for r in semitone_dtw_pairs(
        corpus, "doc_id", "bytes"
    ).collect()}
    assert (8, 1_000_008) in dtw         # warp caught here
    assert not any(i2 == 1_000_012 for _, i2 in dtw)  # pitch not


def test_cascade_attribution_matches_closed_form(spark):
    """End-to-end: every removed clip carries the tier its transform
    dictates and kept_id = the class keeper (min base id)."""
    n_docs = 60
    corpus = _corpus(spark, n_docs=n_docs)
    res = audio_dedup_cascade(
        corpus, "doc_id", default_audio_tiers()
    ).collect()
    got = {r.clip_id: (r.kept_id, r.tier, r.tier_name) for r in res}

    tier_name = {1: "exact", 2: "landmark", 3: "dtw", 4: "pitch"}
    want = {}
    for src in range(0, min(n_docs, 200), 4):
        t = cascade_transform(src)
        tier = {0: 1, 1: 2, 2: 3, 3: 4}[t]
        want[src + 1_000_000] = (src, tier, tier_name[tier])
    # n_docs <= 200: every base class is a singleton, no base removals
    assert got == want
    assert len(res) == len(got)  # no duplicate rows


def test_cascade_base_congruence_goes_to_exact_tier(spark):
    """Base rows of the same class are byte-identical by construction and
    collapse at tier 1 with the class minimum as keeper."""
    n_classes = 10  # force repeats with a small class count
    base = spark.range(30).select(F.col("id").alias("doc_id"))
    synth = synth_cascade_pcm_udf(n_classes=n_classes)
    corpus = (
        base.withColumn("bytes", synth(F.col("doc_id")))
        .withColumn("sr_hz", F.lit(SR))
        .persist()
    )
    res = audio_dedup_cascade(
        corpus, "doc_id", [("exact", lambda d: exact_star_pairs(d, "doc_id", "bytes"))]
    ).collect()
    got = {r.clip_id: (r.kept_id, r.tier) for r in res}
    want = {d: (d % n_classes, 1) for d in range(30) if d >= n_classes}
    assert got == want


def test_removal_semantics_later_tier_never_sees_removed(spark):
    """A clip claimed at tier 1 must not be re-attributed by a later
    tier even though that tier's matcher would also pair it."""
    corpus = _corpus(spark, n_docs=20)
    seen = {}

    def spy(name, fn):
        def wrapped(d):
            seen[name] = {r.doc_id for r in d.select("doc_id").collect()}
            return fn(d)
        return wrapped

    tiers = [(n, spy(n, f)) for n, f in default_audio_tiers()]
    res = audio_dedup_cascade(corpus, "doc_id", tiers).collect()
    # exact copies (src 0, 16) are gone from tier 2's input
    assert 1_000_000 not in seen["landmark"] and 1_000_016 not in seen["landmark"]
    # gain copy gone from tier 3's input
    assert 1_000_004 not in seen["dtw"]
    # warp copy gone from tier 4's input
    assert 1_000_008 not in seen["pitch"]
    # and each clip is attributed exactly once
    ids = [r.clip_id for r in res]
    assert len(ids) == len(set(ids))


def test_bestgain_snr_separation(spark):
    """The tier-2 verify margins: gain copy ~35+ dB, warp copy < 13 dB."""
    from text_similarity_node_spark.operators.audio import (
        pairwise_snr_bestgain_udf,
    )

    corpus = _corpus(spark, n_docs=20)
    b = {r.doc_id: r.bytes for r in corpus.collect()}
    df = spark.createDataFrame(
        [(b[4], b[1_000_004]), (b[8], b[1_000_008])], ["a", "c"]
    )
    snr_gain, snr_warp = [
        r.s for r in df.select(
            pairwise_snr_bestgain_udf(F.col("a"), F.col("c")).alias("s")
        ).collect()
    ]
    assert snr_gain > 30.0
    assert snr_warp < 13.0
