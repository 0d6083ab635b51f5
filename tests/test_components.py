"""Connected-components unit tests on hand-drawn graphs (FIXTURES.md §4)."""

from text_similarity_node_spark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id1 string, id2 string")
    out = connected_components(df)
    return {r.clip_id: r.cluster_id for r in out.collect()}


def test_two_chains_one_triangle(spark):
    # chain a-b-c-d, chain e-f, triangle g-h-i
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("e", "f"),
        ("g", "h"), ("h", "i"), ("g", "i"),
    ]
    labels = _cc(spark, edges)
    assert {labels[x] for x in "abcd"} == {"a"}
    assert {labels[x] for x in "ef"} == {"e"}
    assert {labels[x] for x in "ghi"} == {"g"}


def test_long_chain_converges(spark):
    # a 20-vertex path exercises multi-iteration propagation
    ids = [f"v{i:02d}" for i in range(20)]
    edges = list(zip(ids, ids[1:]))
    labels = _cc(spark, edges)
    assert set(labels.values()) == {"v00"}


def test_star_graph(spark):
    edges = [("hub", f"leaf{i}") for i in range(10)]
    labels = _cc(spark, edges)
    assert set(labels.values()) == {"hub"}


def test_duplicate_and_reversed_edges(spark):
    edges = [("b", "a"), ("a", "b"), ("b", "c"), ("c", "b")]
    labels = _cc(spark, edges)
    assert set(labels.values()) == {"a"}


# ---- two-star (Kiveris alternating large/small-star) variant ----

import random

from text_similarity_node_spark.operators.components import (
    connected_components_twostar,
)


def _cc2(spark, edges):
    df = spark.createDataFrame(edges, "id1 string, id2 string")
    out = connected_components_twostar(df)
    return {r.clip_id: r.cluster_id for r in out.collect()}


def _both_agree(spark, edges):
    a = _cc(spark, edges)
    b = _cc2(spark, edges)
    assert a == b, f"hashmin {a} != twostar {b}"
    return b


def test_twostar_matches_hashmin_fixtures(spark):
    _both_agree(
        spark,
        [
            ("a", "b"), ("b", "c"), ("c", "d"),
            ("e", "f"),
            ("g", "h"), ("h", "i"), ("g", "i"),
        ],
    )
    _both_agree(spark, [("hub", f"leaf{i}") for i in range(10)])
    _both_agree(spark, [("b", "a"), ("a", "b"), ("b", "c"), ("c", "b")])


def test_twostar_matches_hashmin_random_graph(spark):
    rng = random.Random(20260818)
    ids = [f"n{i:03d}" for i in range(120)]
    edges = [tuple(rng.sample(ids, 2)) for _ in range(150)]
    labels = _both_agree(spark, edges)
    # every emitted cluster id is its own cluster's min member
    import collections

    members = collections.defaultdict(list)
    for v, c in labels.items():
        members[c].append(v)
    for c, vs in members.items():
        assert min(vs) == c


def test_twostar_chain_logarithmic_rounds(spark):
    # The reason this variant exists: a 64-link drift chain needs hash-min
    # ~diameter (63) rounds — it cannot even finish inside its default
    # 50-round budget on this shape — while two-star's distance-halving
    # converges logarithmically.  Same 10-round budget for both: hash-min
    # raises, two-star finishes.
    import pytest

    from text_similarity_node_spark.operators.components import (
        ConvergenceError,
        connected_components,
    )

    ids = [f"v{i:02d}" for i in range(64)]
    edges = list(zip(ids, ids[1:]))
    labels = _cc2(spark, edges)
    assert set(labels.values()) == {"v00"}
    assert len(labels) == 64
    assert connected_components_twostar.last_iterations <= 10

    df = spark.createDataFrame(edges, "id1 string, id2 string")
    with pytest.raises(ConvergenceError):
        connected_components(df, max_iterations=10).collect()


def test_twostar_in_pipeline_config():
    from text_similarity_node_spark.config import PipelineConfig

    cfg = PipelineConfig(cc_algorithm="twostar")
    assert cfg.cc_algorithm == "twostar"


# ---------------------------------------------------------------------------
# incremental maintenance
# ---------------------------------------------------------------------------


def test_incremental_equals_full_under_any_split(spark):
    """CC(prior_epoch) + incremental(new_epoch) == CC(all edges), for a
    graph whose second epoch merges previously separate clusters, adds
    brand-new vertices, and leaves some components untouched."""
    import random

    from pyspark.sql import functions as F

    from text_similarity_node_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    random.seed(23)
    edges = set()
    # chains of 4 over 40 bases -> 10 components; epoch 2 merges pairs of
    # them, attaches new vertices 1000+, and leaves half the graph alone
    for c in range(10):
        base = c * 4
        for i in range(3):
            edges.add((base + i, base + i + 1))
    all_edges = sorted(edges)
    random.shuffle(all_edges)
    epoch1 = all_edges[: len(all_edges) // 2]
    epoch2 = all_edges[len(all_edges) // 2 :]
    epoch2 += [(3, 7), (11, 19), (1000, 2), (1001, 1000)]  # merges + new vids

    e1 = spark.createDataFrame(epoch1, "id1 long, id2 long")
    e2 = spark.createDataFrame(epoch2, "id1 long, id2 long")
    full = spark.createDataFrame(
        sorted(set(epoch1) | set(epoch2)), "id1 long, id2 long"
    )

    prior = connected_components(e1)
    got = {
        (r.clip_id, r.cluster_id)
        for r in incremental_components(prior, e2).collect()
    }
    want = {
        (r.clip_id, r.cluster_id) for r in connected_components(full).collect()
    }
    assert got == want
