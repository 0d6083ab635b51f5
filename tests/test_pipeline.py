"""End-to-end pipeline: dup-pair recall >= 0.99 vs brute-force reference
kernels on the planted-cluster clips table (BASELINE.md target #1)."""

from __future__ import annotations

import itertools
import tempfile

import pytest

from text_similarity_node_spark.config import (
    Algorithm,
    AlgorithmConfig,
    PipelineConfig,
    Preprocessing,
)
from text_similarity_node_spark.functions.kernels import similarity
from text_similarity_node_spark.plans.pipeline import NearDupPipeline
from text_similarity_node_spark.sources.clips import ClipsSpec, generate_clips

N_CLIPS = 400
SPEC = ClipsSpec(n_clips=N_CLIPS, seed=42)
CFG = PipelineConfig(
    shingle_mode=Preprocessing.NGRAM,
    ngram_size=3,
    minhash_k=128,
    lsh_bands=32,
    lsh_rows=4,
    verify_threshold=0.8,
    hot_band_threshold=100,
    salt_buckets=4,
    run_id="test_run",
)


@pytest.fixture(scope="module")
def clips_pdf(spark):
    clips, truth = generate_clips(spark, SPEC)
    return clips.select("clip_id", "transcript").toPandas()


@pytest.fixture(scope="module")
def brute_force_pairs(clips_pdf):
    """Oracle: exact reference-kernel multiset-Jaccard on ALL pairs."""
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


@pytest.fixture(scope="module")
def pipeline_result(spark):
    clips, truth = generate_clips(spark, SPEC)
    with tempfile.TemporaryDirectory() as wh:
        pipe = NearDupPipeline(spark, CFG, wh)
        res = pipe.run(clips)
        verified = {
            tuple(sorted((r.id1, r.id2))) for r in res.verified_pairs.collect()
        }
        clusters = {r.clip_id: r.cluster_id for r in res.clusters.collect()}
        metrics = res.metrics.collect()
    return verified, clusters, metrics


def test_recall_vs_brute_force(pipeline_result, brute_force_pairs):
    verified, _, _ = pipeline_result
    assert brute_force_pairs, "oracle produced no dup pairs — generator broken"
    missed = brute_force_pairs - verified
    recall = 1 - len(missed) / len(brute_force_pairs)
    assert recall >= 0.99, (
        f"recall {recall:.4f} < 0.99: missed {len(missed)}/{len(brute_force_pairs)}"
        f" e.g. {sorted(missed)[:5]}"
    )


def test_precision_is_exact(pipeline_result, brute_force_pairs):
    """Verification is the exact kernel — no false positives possible."""
    verified, _, _ = pipeline_result
    false_pos = verified - brute_force_pairs
    assert not false_pos, f"false positives: {sorted(false_pos)[:5]}"


def test_clusters_cover_all_clips(pipeline_result):
    _, clusters, _ = pipeline_result
    assert len(clusters) == N_CLIPS
    # cluster representative is a member id (min-label CC)
    for cid, cluster in clusters.items():
        assert cluster <= cid or cluster in clusters


def test_verified_pairs_share_cluster(pipeline_result):
    verified, clusters, _ = pipeline_result
    for i, j in verified:
        assert clusters[i] == clusters[j], f"verified pair ({i},{j}) split"


def test_metrics_ledger_written(pipeline_result):
    _, _, metrics = pipeline_result
    stages = {m.stage for m in metrics}
    assert {"signatures", "lsh_candidates", "verified_pairs", "clusters"} <= stages
    # no silent caps: the band audit row exists
    assert any(m.stage == "lsh_band_audit" for m in metrics)
