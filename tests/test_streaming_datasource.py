"""End-to-end: the tsn_clips streaming DataSource feeding the incremental
dedup sink — the full kafka-shaped ingestion path (source -> micro-batches
-> band/gram stores -> verified pairs), with the pair set proven equal to
one-shot processing of the same corpus."""

from __future__ import annotations

import os
import tempfile
import time

import pytest

from text_similarity_node_spark.config import PipelineConfig
from text_similarity_node_spark.sources import datasource as dsrc
from text_similarity_node_spark.streaming.incremental import IncrementalDedup

TOTAL, PER_BATCH, SEED = 400, 150, 11


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    dsrc.register(spark)


def _clips_stream(spark):
    return (
        spark.readStream.format("tsn_clips")
        .option("n", TOTAL)
        .option("seed", SEED)
        .option("total_rows", TOTAL)
        .option("rows_per_batch", PER_BATCH)
        .load()
        .select("clip_id", "transcript")
    )


def test_datasource_stream_into_incremental_dedup(spark):
    cfg = PipelineConfig(verify_threshold=0.8, run_id="ds_stream")
    with tempfile.TemporaryDirectory() as d:
        sink = IncrementalDedup(spark, cfg, os.path.join(d, "state"))
        q = (
            _clips_stream(spark)
            .writeStream.foreachBatch(sink.process_batch)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .start()
        )
        deadline = time.time() + 300
        while time.time() < deadline:
            try:
                if spark.read.parquet(sink.docs_path).count() >= TOTAL:
                    break
            except Exception:
                pass
            time.sleep(2)
        q.stop()
        assert spark.read.parquet(sink.docs_path).count() == TOTAL
        streamed = {
            (r.id1, r.id2) for r in sink.verified_pairs().collect()
        }

        # one-shot reference: same 400 rows in a single batch
        ref_sink = IncrementalDedup(spark, cfg, os.path.join(d, "ref_state"))
        all_rows = (
            spark.read.format("tsn_clips")
            .option("n", TOTAL)
            .option("seed", SEED)
            .load()
            .select("clip_id", "transcript")
        )
        ref_sink.process_batch(all_rows, 0)
        oneshot = {(r.id1, r.id2) for r in ref_sink.verified_pairs().collect()}

    assert streamed == oneshot
    assert len(streamed) > 0  # planted dup clusters actually produced pairs
