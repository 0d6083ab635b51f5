"""Warped-snippet subsequence-DTW retrieval (operators/audio_subseq.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio_subseq import (
    segment_note_feats_udf,
    subseq_dtw_retrieve,
    subseq_note_sequence,
    subseq_start,
    synth_subseq_pcm_udf,
)

SR = 16000


def _frames(spark, ids):
    synth = synth_subseq_pcm_udf()
    return (
        spark.createDataFrame([(i,) for i in ids], ["clip_id"])
        .withColumn("bytes", synth(F.col("clip_id")))
        .withColumn("sr_hz", F.lit(SR))
    )


def test_note_sequences_distinct_and_seeded():
    a = subseq_note_sequence(7)
    assert len(set(a.tolist())) == len(a)  # all 16 notes distinct
    assert (a == subseq_note_sequence(7)).all()  # deterministic
    assert not (a == subseq_note_sequence(8)).all()


def test_feature_udf_notes_match_melody(spark):
    """The per-segment argmax band recovers the planted note sequence,
    and the snippet's trigram words overlap the parent's."""
    df = _frames(spark, [40, 1_000_040])
    ingest = segment_note_feats_udf()
    rows = {
        r.clip_id: r
        for r in df.select(
            "clip_id", ingest(F.col("bytes"), F.col("sr_hz")).alias("s")
        ).select("clip_id", "s.*").collect()
    }
    assert rows[40].n_segs == 16 and rows[1_000_040].n_segs == 8
    shared = set(rows[40].words) & set(rows[1_000_040].words)
    assert len(shared) >= 1  # candidates survive the warp


def test_retrieval_recovers_parent_and_start(spark):
    parents = list(range(0, 200, 10))
    catalog = _frames(spark, list(range(0, 200)))
    snippets = _frames(spark, [p + 1_000_000 for p in parents])
    got = {
        r.snippet_id: (r.clip_id, r.start_seg)
        for r in subseq_dtw_retrieve(snippets, catalog).collect()
    }
    want = {p + 1_000_000: (p, subseq_start(p)) for p in parents}
    assert got == want


def test_rigid_snippet_also_retrieved(spark):
    """Sanity: an UNWARPED excerpt (the q96 regime) retrieves too, at
    near-zero cost — subsequence DTW strictly generalizes rigid
    containment."""
    from text_similarity_node_spark.operators.audio_subseq import (
        subseq_dtw_verify_udf,
    )

    catalog = _frames(spark, [3])
    ingest = segment_note_feats_udf()
    cat = catalog.select(
        ingest(F.col("bytes"), F.col("sr_hz")).alias("s")
    ).select("s.*").collect()[0]
    # rigid excerpt = catalog feats rows [2:10]
    feats = np.asarray(cat.feats).reshape(16, 32)
    rigid = feats[2:10].ravel().tolist()
    df = spark.createDataFrame(
        [(rigid, 8, cat.feats, 16)], ["sf", "sn", "cf", "cn"]
    )
    v = df.select(
        subseq_dtw_verify_udf()("sf", "sn", "cf", "cn").alias("v")
    ).collect()[0].v
    assert v.start == 2 and v.cost < 0.01


def test_wrong_clip_rejected_by_threshold(spark):
    """A snippet whose parent is absent from the catalog emits no row."""
    parents = [10, 20]
    catalog = _frames(spark, list(range(0, 30)))
    # remove the parents from the catalog
    catalog = catalog.filter(~F.col("clip_id").isin(parents))
    snippets = _frames(spark, [p + 1_000_000 for p in parents])
    got = subseq_dtw_retrieve(snippets, catalog).collect()
    assert got == []


def test_subseq_degenerates_to_plain_dtw(spark):
    """When the catalog side is exactly snippet-sized there is one
    admissible start: the sliding verify must equal the core
    dtw_distance (the property-tested DP) at start 0."""
    from text_similarity_node_spark.operators.audio_dtw import dtw_distance
    from text_similarity_node_spark.operators.audio_subseq import (
        subseq_dtw_verify_udf,
    )

    rs = np.random.RandomState(5)
    a = rs.randn(8, 32)
    b = rs.randn(8, 32)
    df = spark.createDataFrame(
        [(a.ravel().tolist(), 8, b.ravel().tolist(), 8)],
        ["sf", "sn", "cf", "cn"],
    )
    v = df.select(
        subseq_dtw_verify_udf(radius=2)("sf", "sn", "cf", "cn").alias("v")
    ).collect()[0].v
    assert v.start == 0
    assert v.cost == pytest.approx(dtw_distance(a, b, radius=2), rel=1e-12)
