"""Misra-Gries heavy hitters: candidate-superset guarantee, exact top-k
equivalence on both the MG path and the fallback path, determinism under
repartitioning."""

import numpy as np
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.heavy_hitters import (
    exact_topk,
    mg_candidates,
)


def _zipf_items(spark, n=20000, vocab=2000, parts=8, seed=5):
    rng = np.random.RandomState(seed)
    # Zipf-ish: item i with weight 1/(i+1)
    w = 1.0 / np.arange(1, vocab + 1)
    w /= w.sum()
    draws = rng.choice(vocab, size=n, p=w)
    rows = [(f"item{int(d):05d}",) for d in draws]
    return (
        spark.createDataFrame(rows, "item string").repartition(parts),
        draws,
    )


def test_mg_candidates_contain_all_heavy(spark):
    items, draws = _zipf_items(spark)
    k_counters = 64
    n = len(draws)
    import collections

    exact = collections.Counter(int(d) for d in draws)
    heavy = {
        f"item{i:05d}" for i, c in exact.items() if c > n / (k_counters + 1)
    }
    cand = {r["item"] for r in mg_candidates(items, "item", k_counters).collect()}
    assert heavy, "test corpus must have heavy items"
    assert heavy <= cand, f"missing: {heavy - cand}"


def _full_topk(items, k):
    return (
        items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("item").asc())
        .limit(k)
        .collect()
    )


def test_exact_topk_matches_full_aggregation(spark):
    items, _ = _zipf_items(spark)
    expected = [(r["item"], r["n"]) for r in _full_topk(items, 15)]
    got = [
        (r["item"], r["n"])
        for r in exact_topk(items, "item", 15, k_counters=512).collect()
    ]
    assert got == expected


def test_exact_topk_fallback_path(spark):
    # k_counters too small for the soundness predicate -> fallback still exact
    items, _ = _zipf_items(spark, n=4000, vocab=3000, seed=9)
    expected = [(r["item"], r["n"]) for r in _full_topk(items, 20)]
    got = [
        (r["item"], r["n"])
        for r in exact_topk(items, "item", 20, k_counters=4).collect()
    ]
    assert got == expected


def test_partitioning_invariance(spark):
    items, _ = _zipf_items(spark, parts=3, seed=21)
    a = [
        (r["item"], r["n"])
        for r in exact_topk(items, "item", 10, k_counters=256).collect()
    ]
    b = [
        (r["item"], r["n"])
        for r in exact_topk(
            items.repartition(13), "item", 10, k_counters=256
        ).collect()
    ]
    assert a == b


def test_mg_fold_property():
    """Property test of the pure mergeable-MG fold: on random streams cut
    into random batch sizes, every item's undercount stays within
    n/(k'+1) and every heavy item survives."""
    import collections

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_similarity_node_spark.operators.heavy_hitters import mg_fold

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
        st.integers(min_value=1, max_value=12),
        st.data(),
    )
    def run(stream, k_counters, data):
        # random batch split
        summary: dict = {}
        i = 0
        while i < len(stream):
            step = data.draw(st.integers(min_value=1, max_value=50))
            batch = stream[i : i + step]
            i += step
            counts = collections.Counter(batch)
            summary = mg_fold(summary, counts.items(), k_counters)
        n = len(stream)
        exact = collections.Counter(stream)
        floor = n / (k_counters + 1)
        for it, c in exact.items():
            got = summary.get(it, 0)
            assert got <= c  # never overcounts
            assert c - got <= floor + 1e-9, (it, c, got, floor)
            if c > floor:
                assert it in summary, (it, c, floor)

    run()
