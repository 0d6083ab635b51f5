"""Streaming incremental AUDIO dedup: pair-level equivalence with the batch
operator under micro-batch slicing, cross-batch matches through the marks
store, and the online hot-hash learning contract."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio_fp import audio_neardup
from text_similarity_node_spark.sources.clips import ClipsSpec, generate_clips
from text_similarity_node_spark.streaming.audio_incremental import (
    IncrementalAudioDedup,
)

FP_KW = dict(
    frame_len=2048, hop=1024, peaks_per_frame=2, fanout=1, freq_quant_hz=2.0
)
SCHEMA = "clip_id string, bytes binary, sr_hz int"


@pytest.fixture()
def dirs():
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "incoming")
        state = os.path.join(d, "state")
        ckpt = os.path.join(d, "ckpt")
        os.makedirs(src)
        yield src, state, ckpt


def test_streaming_equals_batch_under_slicing(spark, dirs):
    """Slice one corpus into 4 arrival files (maxFilesPerTrigger=1 -> 4
    micro-batches); the union of per-batch outputs must equal the batch
    operator's pair set on the full corpus, with identical SNR values."""
    src, state, ckpt = dirs
    clips, _truth = generate_clips(spark, ClipsSpec(n_clips=160, seed=31))
    clips = clips.select("clip_id", "bytes", "sr_hz").cache()

    batch_pairs = {
        (r.id1, r.id2, round(r.snr_db, 6))
        for r in audio_neardup(
            clips, "clip_id", "bytes", "sr_hz",
            snr_threshold_db=20.0, **FP_KW,
        ).collect()
    }
    assert batch_pairs  # planted clusters must produce pairs

    # deterministic 4-way slicing by clip index
    with_idx = clips.withColumn(
        "slice", F.abs(F.hash("clip_id")) % 4
    )
    for i in range(4):
        with_idx.filter(F.col("slice") == i).drop("slice").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(src, f"b{i}"))

    dedup = IncrementalAudioDedup(
        spark, state, min_matches=1, snr_threshold_db=20.0, **FP_KW
    )
    q = dedup.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(300)

    stream_pairs = {
        (r.id1, r.id2, round(r.snr_db, 6))
        for r in dedup.verified_pairs().collect()
    }
    assert stream_pairs == batch_pairs

    # incrementally maintained labels == full CC over all verified pairs
    from text_similarity_node_spark.operators.components import (
        connected_components,
    )

    got_labels = {
        (r.clip_id, r.cluster_id) for r in dedup.cluster_labels().collect()
    }
    want_labels = {
        (r.clip_id, r.cluster_id)
        for r in connected_components(
            dedup.verified_pairs().select("id1", "id2")
        ).collect()
    }
    assert got_labels == want_labels and got_labels


def test_cross_batch_match_and_blob_at_rest(spark, dirs):
    """A clip arriving in batch 2 must pair with its batch-1 original via
    the marks store; unique clips must produce nothing."""
    src, state, ckpt = dirs
    clips, truth = generate_clips(spark, ClipsSpec(n_clips=60, seed=17))
    clips = clips.select("clip_id", "bytes", "sr_hz").cache()
    # put one clip of some cluster in batch 1, the rest in batch 2
    t = truth.groupBy("true_cluster_id").agg(
        F.min("clip_id").alias("first_id"), F.count("*").alias("n")
    ).filter(F.col("n") >= 2).limit(1).collect()[0]
    first = clips.filter(F.col("clip_id") == t.first_id)
    rest = clips.filter(F.col("clip_id") != t.first_id)
    first.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b0"))
    rest.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))

    dedup = IncrementalAudioDedup(
        spark, state, min_matches=1, snr_threshold_db=20.0, **FP_KW
    )
    q = dedup.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(300)

    cluster_ids = {
        r.clip_id
        for r in truth.filter(
            F.col("true_cluster_id") == t.true_cluster_id
        ).collect()
    }
    got = dedup.verified_pairs()
    cross = got.filter(
        (F.col("id1") == t.first_id) | (F.col("id2") == t.first_id)
    ).collect()
    assert cross, "batch-1 clip must match its later-arriving duplicates"
    for r in cross:
        other = r.id2 if r.id1 == t.first_id else r.id1
        assert other in cluster_ids


def test_hot_hash_learned_online(spark, dirs):
    """With cap=0 every hash is hot: batch 1 records the hot set and emits
    no pairs; batch 2 (same waveforms, new ids) must exclude those hashes
    BEFORE the join and also emit nothing — the learned-hot contract."""
    src, state, ckpt = dirs
    clips, _ = generate_clips(spark, ClipsSpec(n_clips=30, seed=5))
    c = clips.select("clip_id", "bytes", "sr_hz").cache()
    c.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b0"))
    c.select(
        F.concat(F.lit("re_"), F.col("clip_id")).alias("clip_id"),
        "bytes", "sr_hz",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))

    dedup = IncrementalAudioDedup(
        spark, state, min_matches=1, hash_cap=0, snr_threshold_db=20.0,
        **FP_KW,
    )
    q = dedup.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(300)

    assert dedup.verified_pairs().count() == 0
    hot = dedup.hot_hashes()
    assert hot.count() > 0  # dropped hashes are durable metrics, not silent
    # every learned-hot hash carries its detection-time fanout
    assert hot.filter(F.col("n_at_detection") <= 0).count() == 0
