"""Ledger count-cache contract: when a stage's input IS the previous
stage's output, the redundant rows_in count action is skipped and the
ledger still carries the correct number (pipeline._known_counts)."""

from __future__ import annotations

import tempfile

from text_similarity_node_spark.config import PipelineConfig, Preprocessing
from text_similarity_node_spark.plans.pipeline import NearDupPipeline
from text_similarity_node_spark.sources.clips import ClipsSpec, generate_clips

CFG = PipelineConfig(
    shingle_mode=Preprocessing.NGRAM,
    ngram_size=3,
    minhash_k=128,
    lsh_bands=32,
    lsh_rows=4,
    verify_threshold=0.8,
    hot_band_threshold=100,
    salt_buckets=4,
    checkpoint_stages=False,
    per_partition_metrics=False,
    run_id="ledger_cache_run",
)


def test_chained_rows_in_equals_prior_rows_out(spark):
    clips, _ = generate_clips(spark, ClipsSpec(n_clips=300, seed=7))
    res = NearDupPipeline(spark, CFG, tempfile.mkdtemp()).run(clips)
    rows = {r.stage: r for r in res.metrics.collect()}

    # the chained stages consume the signatures stage output directly:
    # their ledger rows_in must equal its recorded rows_out (served from
    # the cache, no extra count action)
    sig_out = rows["signatures"].rows_out
    assert sig_out > 0
    assert rows["lsh_candidates"].rows_in == sig_out
    assert rows["simhash_candidates"].rows_in == sig_out

    # non-chained inputs still get real counts: exact_groups counts the
    # raw clips table
    assert rows["exact_groups"].rows_in == 300
    assert rows["exact_groups"].rows_out == 300

    # ledger monotonic timestamps (cumulative elapsed) stay intact
    elapsed = [r.elapsed_s for r in sorted(rows.values(), key=lambda r: r.elapsed_s)]
    assert all(b >= a for a, b in zip(elapsed, elapsed[1:]))
