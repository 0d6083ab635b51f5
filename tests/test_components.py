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
