"""Streaming soak: the bench corpus generator sliced into id-ordered
micro-batches through IncrementalDedup must reproduce EXACTLY the
one-shot pipeline's verified pair set with ALL THREE candidate tiers on
(bench.py runs the same gate at 60k clips; this is the suite-sized
version)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from bench import run_streaming_soak, streaming_soak_config
from text_similarity_node_spark.plans.pipeline import NearDupPipeline
from text_similarity_node_spark.sources.clips import ClipsSpec, generate_clips
from text_similarity_node_spark.streaming.incremental import IncrementalDedup


@pytest.fixture()
def clips_path(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "clips.parquet")
        clips, _ = generate_clips(spark, ClipsSpec(n_clips=4000, seed=42))
        clips.write.mode("overwrite").parquet(path)
        yield path


def test_soak_equals_one_shot(spark, clips_path):
    elapsed, per_batch, n_pairs = run_streaming_soak(
        spark, clips_path, n_batches=4
    )
    # the gate inside run_streaming_soak raised if any pair differed;
    # here assert the soak actually exercised multiple non-trivial
    # batches and found the corpus's planted duplicates
    assert len(per_batch) == 4 and all(t > 0 for t in per_batch)
    assert n_pairs > 0


def test_soak_gate_detects_divergence(spark, clips_path):
    """The equality gate is real: a sink that drops a batch's output
    must make run_streaming_soak raise, not report a time."""
    import bench as benchmod

    real = IncrementalDedup.process_batch

    def lossy(self, batch_df, batch_id):
        if batch_id == 1:
            batch_df = batch_df.filter(F.lit(False))
        return real(self, batch_df, batch_id)

    try:
        IncrementalDedup.process_batch = lossy
        with pytest.raises(AssertionError, match="diverged"):
            benchmod.run_streaming_soak(spark, clips_path, n_batches=4)
    finally:
        IncrementalDedup.process_batch = real


def test_soak_config_runs_all_tiers(spark, clips_path):
    """The soak comparable exercises all three candidate tiers: the
    config enables them, and the one-shot reference's source attribution
    contains only known tier names (with minhash_lsh present — the
    corpus's planted near-dups ride the LSH path)."""
    cfg = streaming_soak_config(8, "cfgcheck")
    assert cfg.simhash_enabled and cfg.substring_enabled
    assert cfg.fingerprint_cap >= 10**9  # cap-free: the equality regime
    wh = tempfile.mkdtemp()
    res = NearDupPipeline(spark, cfg, wh).run(spark.read.parquet(clips_path))
    srcs = set()
    for r in res.verified_pairs.select("sources").collect():
        srcs |= set(r.sources.split(","))
    assert "minhash_lsh" in srcs
    assert srcs <= {"minhash_lsh", "simhash", "containment"}
