"""Resume contract (FIXTURES.md §5): a run with pre-populated stage
checkpoints skips those stages and produces identical final clusters."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from text_similarity_node_spark.config import PipelineConfig, Preprocessing
from text_similarity_node_spark.plans.pipeline import NearDupPipeline
from text_similarity_node_spark.sources.catalog import ParquetCatalog
from text_similarity_node_spark.sources.clips import ClipsSpec, generate_clips

SPEC = ClipsSpec(n_clips=150, seed=11)
CFG = PipelineConfig(run_id="resume_a", hot_band_threshold=100, salt_buckets=4)


def _clusters(res):
    return sorted((r.clip_id, r.cluster_id) for r in res.clusters.collect())


def test_resume_identical_results(spark):
    clips, _ = generate_clips(spark, SPEC)
    clips = clips.cache()
    with tempfile.TemporaryDirectory() as wh:
        first = NearDupPipeline(spark, CFG, wh).run(clips)
        base = _clusters(first)

        # simulate a crash after stage 'verified_pairs': drop the later
        # 'clusters' checkpoint, keep everything earlier
        cat = ParquetCatalog(spark, wh)
        chash = CFG.config_hash()
        cat.drop("clusters", chash)

        second = NearDupPipeline(spark, CFG, wh).run(clips)
        assert _clusters(second) == base

        # metrics ledger shows the resumed stages
        resumed = (
            second.metrics.filter(F.col("detail") == "resumed-from-checkpoint")
            .select("stage")
            .collect()
        )
        resumed_stages = {r.stage for r in resumed}
        assert "signatures" in resumed_stages
        assert "verified_pairs" in resumed_stages
        assert "clusters" not in resumed_stages  # recomputed after the crash


def test_config_change_invalidates_checkpoints(spark):
    clips, _ = generate_clips(spark, SPEC)
    with tempfile.TemporaryDirectory() as wh:
        NearDupPipeline(spark, CFG, wh).run(clips)
        cfg2 = PipelineConfig(
            run_id="resume_b",
            hot_band_threshold=100,
            salt_buckets=4,
            verify_threshold=0.9,  # different config -> different hash
        )
        res2 = NearDupPipeline(spark, cfg2, wh).run(clips)
        # nothing may be resumed across a config change
        resumed = res2.metrics.filter(
            F.col("detail") == "resumed-from-checkpoint"
        ).count()
        assert resumed == 0


def test_per_partition_metrics_cover_every_stage(spark):
    """North-rule contract: the ledger carries per-partition rows-in/out
    for each built stage, and the per-partition counts sum to the stage's
    rows_out in the stage-level metrics."""
    clips, _ = generate_clips(spark, SPEC)
    cfg = PipelineConfig(run_id="resume_pp", hot_band_threshold=100, salt_buckets=4)
    with tempfile.TemporaryDirectory() as wh:
        res = NearDupPipeline(spark, cfg, wh).run(clips)
        cat = ParquetCatalog(spark, wh)
        pp = cat.read_ledger("metrics_partitions").filter(
            F.col("run_id") == "resume_pp"
        )
        rows = pp.collect()
        assert rows, "per-partition ledger is empty"
        stage_out = {
            r.stage: r.rows_out
            for r in res.metrics.filter(
                (F.col("run_id") == "resume_pp") & (F.col("rows_out") >= 0)
            ).collect()
        }
        by_stage = {}
        for r in rows:
            if r.direction == "out":
                by_stage.setdefault(r.stage, 0)
                by_stage[r.stage] += r.rows
        # every checkpointed stage has per-partition output rows that sum
        # to the stage-level rows_out
        for stage, total in by_stage.items():
            assert total == stage_out[stage], (stage, total, stage_out[stage])
        assert set(by_stage) == set(stage_out), (
            set(by_stage), set(stage_out)
        )
