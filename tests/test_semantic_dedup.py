"""semantic_dedup (SemDeDup-style k-means-scoped dedup) unit tests.

Planted geometry: three well-separated direction groups in R^8; within two
of them, near-identical copies (dup cliques).  Ground truth is closed-form:
each clique labels to its min id, cross-group cosine is far below the
threshold, singletons are not emitted.
"""

from __future__ import annotations

import numpy as np
import pytest

from text_similarity_node_spark.operators.dedup import semantic_dedup

DIM = 8


def _corpus():
    """Deterministic vectors: groups along distinct coordinate axes with
    small fixed perturbations.  Returns (rows, expected_labels)."""
    rng = np.random.RandomState(7)
    rows = []
    expected = {}
    # group A: ids 0..3 are copies of axis-0 + tiny noise -> clique rep 0
    # group B: ids 10..11 copies of axis-3 -> clique rep 10
    # singletons: ids 20, 21 on axes 5, 6
    for i, (ids, axis) in enumerate([((0, 1, 2, 3), 0), ((10, 11), 3)]):
        base = np.zeros(DIM)
        base[axis] = 1.0
        for j, vid in enumerate(ids):
            v = base + rng.uniform(-1e-3, 1e-3, DIM)
            rows.append((vid, [float(x) for x in v]))
            expected[vid] = min(ids)
    for vid, axis in [(20, 5), (21, 6)]:
        v = np.zeros(DIM)
        v[axis] = 1.0
        rows.append((vid, [float(x) for x in v]))
    return rows, expected


@pytest.mark.parametrize("hot_threshold", [50_000, 1])
def test_semantic_dedup_cliques(spark, hot_threshold):
    """Correct labels on planted cliques; hot_threshold=1 forces every
    list through the salted triangle join (the skew path) and must give
    the identical result."""
    rows, expected = _corpus()
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    labels = semantic_dedup(
        df, "vec_id", "v", dim=DIM, threshold=0.98,
        n_lists=4, nprobe=2, hot_list_threshold=hot_threshold,
        salt_buckets=3,
    )
    got = {r["vec_id"]: r["rep_id"] for r in labels.collect()}
    assert got == expected  # singletons 20/21 absent, cliques -> min id


def test_semantic_dedup_boundary_pair_via_probes(spark):
    """A dup pair whose members could land in different home lists is
    still found through the nprobe expansion: with n_lists == number of
    distinct directions, near-identical vectors always agree within the
    2-probe reach on this deterministic corpus."""
    rows, expected = _corpus()
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    # n_lists = 8 > distinct directions: some centroids are jittered
    # duplicates of the same direction (the boundary-risk regime)
    labels = semantic_dedup(
        df, "vec_id", "v", dim=DIM, threshold=0.98, n_lists=8, nprobe=4
    )
    got = {r["vec_id"]: r["rep_id"] for r in labels.collect()}
    assert got == expected


def test_keep_low_centroid_sim_policy(spark):
    """The SemDeDup keep policy: the representative is the member LEAST
    similar to its home centroid (ties -> min id).  Planted geometry:
    clique members at graded distances from the shared axis direction,
    so the expected representative is the most perturbed member."""
    import numpy as np

    rows = []
    base = np.zeros(DIM)
    base[0] = 1.0
    # member 3 is the most perturbed (largest angle from the centroid,
    # which k-means places near the group mean); cosines stay > 0.99
    for vid, eps in [(0, 0.0), (1, 0.02), (2, 0.05), (3, 0.09)]:
        v = base.copy()
        v[1] = eps
        rows.append((vid, [float(x) for x in v / np.linalg.norm(v)]))
    rows.append((20, [0.0, 0.0, 0.0, 1.0] + [0.0] * (DIM - 4)))  # singleton
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    labels = semantic_dedup(
        df, "vec_id", "v", dim=DIM, threshold=0.99, n_lists=2, nprobe=2,
        keep="low_centroid_sim",
    )
    got = {r["vec_id"]: r["rep_id"] for r in labels.collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    # default policy on the same corpus keeps min id
    labels2 = semantic_dedup(
        df, "vec_id", "v", dim=DIM, threshold=0.99, n_lists=2, nprobe=2
    )
    got2 = {r["vec_id"]: r["rep_id"] for r in labels2.collect()}
    assert got2 == {0: 0, 1: 0, 2: 0, 3: 0}
