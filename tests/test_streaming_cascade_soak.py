"""Streaming AUDIO cascade soak: the bench clips corpus (planted
duplicate clusters with jittered two-sine payloads, sources/clips.py)
sliced into id-ordered micro-batches through IncrementalAudioCascade
must reproduce the one-shot batch cascade's per-clip tier attribution
EXACTLY — the 62x-scale version of test_streaming_cascade.py's 48-doc
equality proof, exercising the cross-batch feature stores with dense
match graphs (this corpus's sine content collides heavily in the
dtw/pitch tiers, which is precisely what stresses the store paths).

Caps are pinned high on BOTH sides: batch caps count keys over the
whole corpus while the stream counts per arrival prefix (+ learned hot
store), so batch==stream equality is contractual only when no cap
fires (documented on default_audio_tiers)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio_cascade import (
    audio_dedup_cascade,
    default_audio_tiers,
)
from text_similarity_node_spark.sources.clips import ClipsSpec, generate_clips
from text_similarity_node_spark.streaming.cascade import IncrementalAudioCascade

_NO_CAP = 1 << 30


@pytest.fixture()
def corpus(spark):
    clips, _ = generate_clips(spark, ClipsSpec(n_clips=3000, seed=42))
    c = (
        clips.select("clip_id", "bytes", "sr_hz")
        .withColumn(
            "_ord", F.regexp_extract("clip_id", r"(\d+)$", 1).cast("long")
        )
        .persist()
    )
    c.count()
    yield c
    c.unpersist()


def test_cascade_soak_equals_batch(spark, corpus):
    import time

    batch_out = {
        (r.clip_id, r.kept_id, r.tier, r.tier_name)
        for r in audio_dedup_cascade(
            corpus.drop("_ord"),
            "clip_id",
            default_audio_tiers(
                id_col="clip_id",
                hash_cap=_NO_CAP,
                word_cap=_NO_CAP,
                key_cap=_NO_CAP,
            ),
        ).collect()
    }
    assert len(batch_out) > 1000  # dense corpus: the soak is not a toy
    # multiple tiers genuinely fire on this corpus
    assert len({t for (_, _, _, t) in batch_out}) >= 2

    n_batches = 3
    hi = corpus.agg(F.max("_ord")).collect()[0][0] + 1
    edges = [hi * i // n_batches for i in range(n_batches + 1)]
    with tempfile.TemporaryDirectory() as d:
        sink = IncrementalAudioCascade(
            spark,
            os.path.join(d, "state"),
            hash_cap=_NO_CAP,
            word_cap=_NO_CAP,
            key_cap=_NO_CAP,
        )
        per_batch = []
        for b in range(n_batches):
            t0 = time.time()
            sink.process_batch(
                corpus.filter(
                    (F.col("_ord") >= edges[b]) & (F.col("_ord") < edges[b + 1])
                ).drop("_ord"),
                b,
            )
            per_batch.append(round(time.time() - t0, 2))
        stream_out = {
            (r.clip_id, r.kept_id, r.tier, r.tier_name)
            for r in sink.attributions()
            .select("clip_id", "kept_id", "tier", "tier_name")
            .collect()
        }
        # batch ledger rows recorded the per-batch walls durably too
        from text_similarity_node_spark.streaming.ledger import (
            read_batch_metrics,
        )

        n_ledger = read_batch_metrics(spark, sink.state_dir).count()
    assert stream_out == batch_out
    assert len(per_batch) == n_batches and all(t > 0 for t in per_batch)
    assert n_ledger == n_batches
