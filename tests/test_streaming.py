"""Incremental streaming dedup: two file-arrival batches; pairs found both
within a batch and across batches against the signature store."""

from __future__ import annotations

import os
import tempfile

import pytest

from text_similarity_node_spark.config import PipelineConfig
from text_similarity_node_spark.streaming.incremental import IncrementalDedup

SCHEMA = "clip_id string, transcript string"


@pytest.fixture()
def dirs():
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "incoming")
        state = os.path.join(d, "state")
        ckpt = os.path.join(d, "ckpt")
        os.makedirs(src)
        yield src, state, ckpt


def _write_batch(spark, src, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, name)
    )


def test_incremental_dedup_across_batches(spark, dirs):
    src, state, ckpt = dirs
    cfg = PipelineConfig(verify_threshold=0.8, run_id="stream_test")
    dedup = IncrementalDedup(spark, cfg, state)

    base = "the quick brown fox jumps over the lazy dog again and again today"
    # batch 1: one dup pair inside the batch
    _write_batch(
        spark, src,
        [("c1", base), ("c2", base + "!"), ("c3", "completely different words here")],
        "b1",
    )
    q = dedup.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(120)

    pairs1 = {(r.id1, r.id2) for r in dedup.verified_pairs().collect()}
    assert ("c1", "c2") in pairs1
    assert not any("c3" in p for p in pairs1)

    # batch 2: a dup of historical c1 plus a new unique
    _write_batch(
        spark, src,
        [("c4", base + " extra"), ("c5", "nothing matches this transcript at all")],
        "b2",
    )
    q = dedup.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(120)

    pairs2 = {(r.id1, r.id2) for r in dedup.verified_pairs().collect()}
    assert ("c1", "c4") in pairs2  # cross-batch match via the band store
    assert ("c1", "c2") in pairs2  # batch-1 output retained
    assert not any("c5" in p for p in pairs2)
