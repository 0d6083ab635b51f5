"""Incremental semantic (embedding) dedup: pair-level equivalence with
brute force across batch slicings, replay idempotence, frozen centroids."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.streaming.embedding_incremental import (
    IncrementalSemanticDedup,
)

DIM = 8
SCHEMA = "vec_id long, v array<double>"


def _corpus():
    """Planted clique geometry (the semantic_dedup test family): groups on
    distinct axes, near-identical members within a group."""
    rng = np.random.RandomState(21)
    rows = []
    groups = [((0, 1, 2), 0), ((10, 11), 3), ((20, 21, 22, 23), 6)]
    for ids, axis in groups:
        base = np.zeros(DIM)
        base[axis] = 1.0
        for vid in ids:
            v = base + rng.uniform(-1e-3, 1e-3, DIM)
            rows.append((vid, [float(x) for x in v]))
    for vid, axis in [(30, 1), (31, 2), (32, 4)]:  # singletons
        v = np.zeros(DIM)
        v[axis] = 1.0
        rows.append((vid, [float(x) for x in v]))
    return rows


def _truth_pairs(rows, threshold=0.98):
    out = set()
    for i, (id1, v1) in enumerate(rows):
        for id2, v2 in rows[i + 1:]:
            a, b = np.asarray(v1), np.asarray(v2)
            cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            if cos >= threshold:
                out.add((min(id1, id2), max(id1, id2)))
    return out


@pytest.fixture()
def dirs():
    with tempfile.TemporaryDirectory(prefix="tsn_sem_stream_") as d:
        yield (
            os.path.join(d, "src"),
            os.path.join(d, "state"),
            os.path.join(d, "ckpt"),
        )


def _write_batch(spark, src, rows, name):
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, name))


def test_streamed_pairs_equal_brute_force(spark, dirs):
    """Three-batch slicing finds exactly the brute-force pair set —
    including pairs that STRADDLE batches in both directions.  Full probe
    (nprobe == n_lists) is the provably-exact anchor configuration (the
    q33 pattern): every (new, history) pair meets regardless of how the
    first-batch codebook fell; smaller nprobe trades boundary recall for
    scan fraction and is exercised by the batch-level q60/unit tests."""
    src, state, ckpt = dirs
    rows = _corpus()
    dedup = IncrementalSemanticDedup(spark, state, dim=DIM, n_lists=4, nprobe=4)
    for i, sl in enumerate([rows[0:4], rows[4:9], rows[9:]]):
        _write_batch(spark, src, sl, f"b{i}")
        q = dedup.start(src + "/*", SCHEMA, ckpt)
        q.awaitTermination(300)
    got = {
        (r["id1"], r["id2"]) for r in dedup.verified_pairs().collect()
    }
    assert got == _truth_pairs(rows)


def test_replay_is_idempotent(spark, dirs):
    """Re-running a batch id overwrites its own pair dir; the global pair
    set is unchanged (the crash-between-write-and-commit case)."""
    src, state, ckpt = dirs
    rows = _corpus()
    dedup = IncrementalSemanticDedup(spark, state, dim=DIM, n_lists=4, nprobe=2)
    _write_batch(spark, src, rows, "b0")
    q = dedup.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(300)
    before = sorted(
        (r["id1"], r["id2"]) for r in dedup.verified_pairs().collect()
    )
    # replay batch 0 by hand (same batch_id) — pairs must not duplicate
    batch = spark.createDataFrame(rows, SCHEMA)
    dedup.process_batch(batch, 0)
    after = sorted(
        (r["id1"], r["id2"]) for r in dedup.verified_pairs().collect()
    )
    assert after == before


def test_centroids_frozen_across_restart(spark, dirs):
    """A new sink instance over the same state dir loads the persisted
    codebook instead of retraining — assignments cannot drift."""
    src, state, ckpt = dirs
    rows = _corpus()
    d1 = IncrementalSemanticDedup(spark, state, dim=DIM, n_lists=4, nprobe=2)
    _write_batch(spark, src, rows[:5], "b0")
    q = d1.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(300)
    c1 = d1._centroids(spark.createDataFrame(rows[:1], SCHEMA))
    d2 = IncrementalSemanticDedup(spark, state, dim=DIM, n_lists=4, nprobe=2)
    c2 = d2._centroids(spark.createDataFrame(rows[5:6], SCHEMA))
    assert np.allclose(c1, c2)


def test_over_cap_candidates_take_semi_join_path(spark, dirs, monkeypatch):
    """More distinct candidate vec ids than _ISIN_PUSHDOWN_CAP: the
    historical payload fetch must go through the distributed left-semi
    join, never collecting the id set to the driver (the text path's
    round-2 discipline, mirrored)."""
    import text_similarity_node_spark.streaming.embedding_incremental as emb

    monkeypatch.setattr(emb, "_ISIN_PUSHDOWN_CAP", 2)
    src, state, ckpt = dirs
    rows = _corpus()
    dedup = IncrementalSemanticDedup(spark, state, dim=DIM, n_lists=4, nprobe=4)
    _write_batch(spark, src, rows[:9], "b0")  # the three cliques' members
    q = dedup.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(300)
    # batch 2: near-copies of several historical vectors -> many distinct
    # candidate ids, all fetched via the semi-join path
    copies = [
        (vid + 100, [x + 1e-4 for x in v]) for vid, v in rows[:9]
    ]
    _write_batch(spark, src, copies, "b1")
    q = dedup.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(300)
    pairs = {(r["id1"], r["id2"]) for r in dedup.verified_pairs().collect()}
    for vid, _ in rows[:9]:
        assert (vid, vid + 100) in pairs, f"missing cross-batch pair {vid}"


def test_batch_metrics_ledger(spark, dirs):
    """Each micro-batch writes exactly one metrics row (rows_in,
    candidates, pairs, wall time); a replayed batch OVERWRITES its row
    instead of appending a duplicate."""
    from text_similarity_node_spark.streaming.ledger import read_batch_metrics

    src, state, ckpt = dirs
    rows = _corpus()
    dedup = IncrementalSemanticDedup(spark, state, dim=DIM, n_lists=4, nprobe=4)
    for i, sl in enumerate([rows[:6], rows[6:]]):
        _write_batch(spark, src, sl, f"b{i}")
        q = dedup.start(src + "/*", SCHEMA, ckpt)
        q.awaitTermination(300)
    m = {r["batch_id"]: r for r in read_batch_metrics(spark, state).collect()}
    assert set(m) == {0, 1}
    assert m[0]["rows_in"] == 6 and m[1]["rows_in"] == len(rows) - 6
    assert all(r["sink"] == "semantic" and r["elapsed_s"] > 0 for r in m.values())
    # replay batch 0: still exactly one row per batch
    dedup.process_batch(spark.createDataFrame(rows[:6], SCHEMA), 0)
    again = read_batch_metrics(spark, state).collect()
    assert len(again) == 2


def test_compaction_preserves_results_and_bounds_files(spark, dirs):
    """compact_stores shrinks member/vector store file counts without
    changing subsequent dedup results."""
    import glob

    src, state, ckpt = dirs
    rows = _corpus()
    dedup = IncrementalSemanticDedup(spark, state, dim=DIM, n_lists=4, nprobe=4)
    for i, sl in enumerate([rows[:4], rows[4:7], rows[7:9]]):
        _write_batch(spark, src, sl, f"b{i}")
        q = dedup.start(src + "/*", SCHEMA, ckpt)
        q.awaitTermination(300)
    before_files = len(glob.glob(os.path.join(state, "vec_store", "*.parquet")))
    dedup.compact_stores()
    after_files = len(glob.glob(os.path.join(state, "vec_store", "*.parquet")))
    assert after_files <= max(1, before_files // 2)
    # the next batch (straddling pairs against compacted history) is intact
    _write_batch(spark, src, rows[9:], "b3")
    q = dedup.start(src + "/*", SCHEMA, ckpt)
    q.awaitTermination(300)
    got = {(r["id1"], r["id2"]) for r in dedup.verified_pairs().collect()}
    assert got == _truth_pairs(rows)
