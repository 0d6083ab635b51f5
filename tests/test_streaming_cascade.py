"""Streaming tiered audio cascade: per-clip tier attribution equal to the
one-shot batch cascade under id-ordered micro-batch slicing, cross-batch
matches at every tier through the per-tier stores, and the arrival-order
contract metric."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio_cascade import (
    audio_dedup_cascade,
    default_audio_tiers,
    synth_cascade_pcm_udf,
)
from text_similarity_node_spark.streaming.cascade import IncrementalAudioCascade

SCHEMA = "clip_id long, bytes binary, sr_hz int"
SR = 16000


@pytest.fixture()
def dirs():
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "incoming")
        state = os.path.join(d, "state")
        ckpt = os.path.join(d, "ckpt")
        os.makedirs(src)
        yield src, state, ckpt


def _corpus(spark, n_docs=48):
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    copies = base.filter(
        (F.col("doc_id") < 200) & (F.col("doc_id") % 4 == 0)
    ).select((F.col("doc_id") + 1_000_000).alias("doc_id"))
    synth = synth_cascade_pcm_udf(n_classes=200)
    return (
        base.unionByName(copies)
        .select(F.col("doc_id").alias("clip_id"))
        .withColumn("bytes", synth(F.col("clip_id")))
        .withColumn("sr_hz", F.lit(SR))
        .persist()
    )


def test_streaming_cascade_equals_batch(spark, dirs):
    """Three id-ordered arrival files (originals, then copies in two
    waves) -> the union of per-batch attributions equals the one-shot
    cascade: every copy lands at the same tier with the same keeper,
    found ACROSS batches through the per-tier stores."""
    src, state, ckpt = dirs
    corpus = _corpus(spark, n_docs=48)

    batch_out = {
        (r.clip_id, r.kept_id, r.tier, r.tier_name)
        for r in audio_dedup_cascade(
            corpus.withColumnRenamed("clip_id", "doc_id"),
            "doc_id",
            default_audio_tiers(id_col="doc_id"),
        ).collect()
    }
    # all four tiers must actually be represented in the ground truth
    assert {t for _, _, t, _ in batch_out} == {1, 2, 3, 4}

    # waves must be genuinely id-ORDERED (the ingest contract): the
    # former %-8 interleaving shipped some smaller-id copies AFTER
    # larger-id ones — masked while removed clips left the stores, but
    # with one-shot-faithful visibility those rows now correctly trip
    # the arrival-contract metric
    slices = [
        corpus.filter(F.col("clip_id") < 1_000_000),
        corpus.filter(
            (F.col("clip_id") >= 1_000_000) & (F.col("clip_id") < 1_000_024)
        ),
        corpus.filter(F.col("clip_id") >= 1_000_024),
    ]
    for i, df in enumerate(slices):
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"b{i}")
        )

    sink = IncrementalAudioCascade(spark, state)
    q = sink.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(600)

    stream_out = {
        (r.clip_id, r.kept_id, r.tier, r.tier_name)
        for r in sink.attributions().collect()
    }
    assert stream_out == batch_out
    # no arrival-order violations on an id-ordered stream
    hot = sink.hot_keys()
    assert hot.filter(F.col("tier_name") == "arrival_contract").count() == 0


def test_streaming_cascade_stores_follow_tier_visibility(spark, dirs):
    """One-shot-faithful state: a clip removed at tier t stays visible
    to the stores of tiers <= t (it was in the one-shot residual there —
    possibly as a keeper other clips chain to) and is absent from every
    LATER tier's store."""
    src, state, ckpt = dirs
    corpus = _corpus(spark, n_docs=24)
    corpus.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "b0")
    )
    sink = IncrementalAudioCascade(spark, state)
    q = sink.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(600)

    removed_at = {r.clip_id: r.tier for r in sink.attributions().collect()}
    assert removed_at and max(removed_at.values()) >= 2
    store_tier = {
        "marks_store": 2, "clips_store": 2,
        "words_store": 3, "feats_store": 3, "prof_store": 4,
    }
    for store, tier in store_tier.items():
        ids = {
            r.clip_id
            for r in spark.read.parquet(os.path.join(state, store))
            .select("clip_id").distinct().collect()
        }
        for clip, t in removed_at.items():
            if t < tier:
                assert clip not in ids, (store, clip)
            else:
                assert clip in ids, (store, clip)
    # md5_store is the per-hash-MIN representation (one row per distinct
    # content hash): a tier-1-removed clip is represented by its keeper
    # (same hash, smaller id), so it is ABSENT; every clip removed at a
    # later tier has its own hash and IS its hash's min, so it is present.
    md5 = spark.read.parquet(os.path.join(state, "md5_store"))
    md5_rows = md5.select("clip_id", "h").collect()
    ids = {r.clip_id for r in md5_rows}
    hashes = [r.h for r in md5_rows]
    assert len(hashes) == len(set(hashes)), "md5_store not one-row-per-hash"
    for clip, t in removed_at.items():
        if t == 1:
            assert clip not in ids, ("md5_store", clip)
        else:
            assert clip in ids, ("md5_store", clip)


def test_streaming_cascade_replay_idempotent(spark, dirs):
    """Re-processing a batch (crash-replay) overwrites its batch-keyed
    attribution dir rather than doubling rows."""
    src, state, ckpt = dirs
    corpus = _corpus(spark, n_docs=16)
    sink = IncrementalAudioCascade(spark, state)
    rows = corpus.collect()
    df = spark.createDataFrame(rows, corpus.schema)
    sink.process_batch(df, 0)
    first = sorted(
        (r.clip_id, r.kept_id, r.tier) for r in sink.attributions().collect()
    )
    sink.process_batch(df, 0)  # replay
    second = sorted(
        (r.clip_id, r.kept_id, r.tier) for r in sink.attributions().collect()
    )
    assert first == second


def test_landmark_min_matches_rule(spark, dirs):
    """Tier-2 candidate parity with the batch cascade: a pair sharing
    exactly ONE landmark hash never reaches the SNR verify (batch
    landmark_snr_pairs defaults to min_matches=2), while >= 2 distinct
    shared hashes — even when replay-doubled store rows repeat them —
    do.  Exercises _pair_candidates(with_key=True) + the count rule the
    48-doc equality corpus cannot distinguish."""
    import inspect

    from text_similarity_node_spark.operators.audio_cascade import (
        landmark_snr_pairs,
    )

    src, state, ckpt = dirs
    sink = IncrementalAudioCascade(spark, state)
    # defaults-parity pin: streaming min_matches == batch min_matches
    batch_default = inspect.signature(landmark_snr_pairs).parameters[
        "min_matches"
    ].default
    assert sink.min_matches == batch_default == 2

    # new-side clips: 1<->2 share one hash, 1<->3 share two
    new_kv = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10), (3, 11), (3, 12)],
        ["clip_id", "h"],
    )
    # history clip 0 shares two hashes with 1 (rows doubled to simulate
    # a crash-replayed append: count must be DISTINCT-h based)
    hist_kv = spark.createDataFrame(
        [(0, 10), (0, 10), (0, 11), (0, 11), (0, 99)], ["clip_id", "h"]
    )
    cand = (
        sink._pair_candidates(new_kv, hist_kv, "landmark", [], with_key=True)
        .groupBy("id1", "id2")
        .agg(F.count_distinct("h").alias("n_matches"))
        .filter(F.col("n_matches") >= sink.min_matches)
        .select("id1", "id2")
    )
    got = {(r.id1, r.id2) for r in cand.collect()}
    assert got == {(1, 3), (0, 1)}  # (1,2) single-hash pair filtered


def test_landmark_cap_fires_mid_stream_observably(spark, dirs):
    """A landmark hash crossing hash_cap at batch k is (a) recorded in
    hot_store under that batch with its count at detection, (b) excluded
    from the landmark store and every later batch's tier-2 join, and (c)
    the affected clips still dedup at a LATER tier — the divergence from
    the cap-free one-shot cascade (which would catch them at tier 2) is
    fully attributable from durable state, never silent."""
    src, state, ckpt = dirs
    # class-0 gain copies: same chord + envelope (=> identical landmark
    # hashes), each with unique seeded noise (=> byte-distinct, so tier 1
    # cannot collapse them).  src values 4,20,...,100 all map to the gain
    # transform ((src//4) % 4 == 1) and class 0 (n_classes=4).
    synth = synth_cascade_pcm_udf(n_classes=4)

    def clips(ids):
        return (
            spark.range(1)
            .select(F.explode(F.array(*[F.lit(i) for i in ids])).alias("clip_id"))
            .withColumn("bytes", synth(F.col("clip_id")))
            .withColumn("sr_hz", F.lit(SR))
        )

    sink = IncrementalAudioCascade(spark, state, hash_cap=3)
    # batch 0: the class-0 source + three other-class clips; no cap fires
    sink.process_batch(clips([0, 1, 2, 3]), 0)
    hot0 = sink.hot_keys().filter(F.col("tier_name") == "landmark")
    assert hot0.count() == 0
    # batch 1: six gain copies of class 0 — every shared landmark hash
    # appears 6 > cap 3 times and must cross the cap NOW
    gain_ids = [1_000_004, 1_000_020, 1_000_036, 1_000_052, 1_000_068,
                1_000_084]
    sink.process_batch(clips(gain_ids), 1)
    hot1 = sink.hot_keys().filter(F.col("tier_name") == "landmark").collect()
    assert hot1, "cap crossing left no landmark hot_store rows"
    assert all(r.n_at_detection > 3 for r in hot1)
    hot_hashes = {r.h for r in hot1}
    # hot hashes never entered the landmark store from the capped batch:
    # any store row with a hot hash is the batch-0 source's
    marks = spark.read.parquet(os.path.join(state, "marks_store"))
    offenders = marks.filter(
        F.col("h").isin(*hot_hashes) & (F.col("clip_id") >= 1_000_000)
    )
    assert offenders.count() == 0
    # the gain clips still dedup'd — at a later tier than the cap-free
    # one-shot cascade's tier 2, with the same keeper (the class source)
    att = {r.clip_id: (r.tier, r.kept_id) for r in sink.attributions().collect()}
    for g in gain_ids:
        assert g in att, f"clip {g} silently lost"
        tier, keeper = att[g]
        assert tier >= 3, (g, tier)
        assert keeper == 0, (g, keeper)
    # batch 2: one more class-0 gain copy — known-hot exclusion keeps its
    # landmark rows out of the store and it still dedups downstream
    sink.process_batch(clips([1_000_100]), 2)
    marks2 = spark.read.parquet(os.path.join(state, "marks_store"))
    assert marks2.filter(
        F.col("h").isin(*hot_hashes) & (F.col("clip_id") == 1_000_100)
    ).count() == 0
    att2 = {r.clip_id: (r.tier, r.kept_id)
            for r in sink.attributions().collect()}
    assert att2[1_000_100][0] >= 3 and att2[1_000_100][1] == 0
    # ledger rows exist for every batch (per-batch metrics, replay-keyed)
    from text_similarity_node_spark.streaming.ledger import read_batch_metrics
    m = read_batch_metrics(spark, state)
    assert {r.batch_id for r in m.collect()} == {0, 1, 2}
