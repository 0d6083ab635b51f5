"""Recall gate at the BENCH configuration (5-gram shingles).

bench.py runs the pipeline with ngram_size=5 (see bench_pipeline_config for
why); the recall>=0.99-vs-brute-force mandate must hold at THAT
shingle/signature config too, not only at the n=3 config test_pipeline.py
pins.  Same harness, bench config, fresh corpus.
"""

from __future__ import annotations

import itertools
import tempfile

import pytest

from test_pipeline import _co_clustered_pairs, _oracle_clusters

from text_similarity_node_spark.config import (
    Algorithm,
    AlgorithmConfig,
    PipelineConfig,
    Preprocessing,
)
from text_similarity_node_spark.functions.kernels import similarity
from text_similarity_node_spark.plans.pipeline import NearDupPipeline
from text_similarity_node_spark.sources.clips import ClipsSpec, generate_clips

N_CLIPS = 250
SPEC = ClipsSpec(n_clips=N_CLIPS, seed=1234)
CFG = PipelineConfig(
    ngram_size=5,
    verify_threshold=0.8,
    hot_band_threshold=100,
    salt_buckets=4,
    run_id="bench_cfg_test",
)


@pytest.fixture(scope="module")
def clips_pdf(spark):
    clips, _ = generate_clips(spark, SPEC)
    return clips.select("clip_id", "transcript").toPandas()


@pytest.fixture(scope="module")
def brute_force_pairs(clips_pdf):
    kcfg = AlgorithmConfig(
        algorithm=Algorithm.JACCARD,
        preprocessing=Preprocessing.NGRAM,
        ngram_size=CFG.ngram_size,
    )
    rows = list(clips_pdf.itertuples(index=False))
    out = set()
    for a, b in itertools.combinations(rows, 2):
        if similarity(a.transcript, b.transcript, kcfg) >= CFG.verify_threshold:
            i, j = sorted((a.clip_id, b.clip_id))
            out.add((i, j))
    return out


def test_recall_and_precision_at_bench_config(spark, clips_pdf, brute_force_pairs):
    clips, _ = generate_clips(spark, SPEC)
    with tempfile.TemporaryDirectory() as wh:
        res = NearDupPipeline(spark, CFG, wh).run(clips)
        clusters = {r.clip_id: r.cluster_id for r in res.clusters.collect()}
    assert brute_force_pairs, "oracle produced no dup pairs — generator broken"
    oracle = _oracle_clusters(brute_force_pairs, list(clips_pdf["clip_id"]))
    want = _co_clustered_pairs(oracle)
    got = _co_clustered_pairs(clusters)
    missed = want - got
    recall = 1 - len(missed) / len(want)
    assert recall >= 0.99, (
        f"recall {recall:.4f} < 0.99 at bench config: "
        f"missed {len(missed)}/{len(want)} e.g. {sorted(missed)[:5]}"
    )
    false_pos = got - want
    assert not false_pos, f"false co-clusterings: {sorted(false_pos)[:5]}"
