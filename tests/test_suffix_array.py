"""Distributed suffix array (prefix doubling): ranks and repeated-substring
pairs vs brute-force Python truth, including dense-rank boundary behavior,
non-ASCII codepoints, within-doc repeats, and the group cap."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators import suffix_array as sa


def _rank_truth(texts: dict, depth: int) -> dict:
    """Dense rank of s[pos:pos+depth] over all suffixes (truncated-slice
    lexicographic order == sentinel-terminated order)."""
    sufs = {
        (i, p): t[p : p + depth]
        for i, t in texts.items()
        for p in range(len(t))
    }
    order = {s: r + 1 for r, s in enumerate(sorted(set(sufs.values())))}
    return {k: order[v] for k, v in sufs.items()}


def _pair_truth(texts: dict, L: int) -> set:
    def grams(t):
        return {t[i : i + L] for i in range(len(t) - L + 1)}

    return {
        (a, b)
        for a, b in itertools.combinations(sorted(texts), 2)
        if grams(texts[a]) & grams(texts[b])
    }


def _df(spark, texts: dict):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def test_suffix_ranks_random_corpus(spark):
    rng = random.Random(7)
    texts = {
        i: "".join(rng.choice("abcd") for _ in range(rng.randint(0, 40)))
        for i in range(30)
    }
    texts[100] = ""  # empty doc contributes no suffixes
    ranked, info = sa.suffix_ranks(_df(spark, texts), "doc_id", "text", 16)
    got = {(r.doc_id, r.pos): r.rank for r in ranked.collect()}
    truth = _rank_truth({i: t for i, t in texts.items() if t}, info["depth"])
    assert got == truth
    assert info["n_suffixes"] == sum(len(t) for t in texts.values())


def test_suffix_ranks_non_ascii(spark):
    texts = {1: "żółć żółć", 2: "żółw", 3: "zolc"}
    ranked, info = sa.suffix_ranks(_df(spark, texts), "doc_id", "text", 4)
    got = {(r.doc_id, r.pos): r.rank for r in ranked.collect()}
    assert got == _rank_truth(texts, info["depth"])


def test_early_convergence_stops_doubling(spark):
    # all-distinct single chars: converges at depth 1, never doubles
    texts = {1: "abc", 2: "xyz"}
    ranked, info = sa.suffix_ranks(_df(spark, texts), "doc_id", "text", 64)
    assert info["all_distinct"] and info["depth"] == 1
    assert {(r.doc_id, r.pos): r.rank for r in ranked.collect()} == _rank_truth(
        texts, 1
    )


@pytest.mark.parametrize("L", [1, 2, 5, 7, 8, 13])
def test_repeated_substring_pairs_random(spark, L):
    rng = random.Random(L * 31 + 1)
    # small alphabet forces shared substrings at several lengths
    texts = {
        i: "".join(rng.choice("ab") for _ in range(rng.randint(0, 30)))
        for i in range(24)
    }
    pairs, metrics, _ = sa.repeated_substring_pairs(
        _df(spark, texts), "doc_id", "text", min_len=L
    )
    got = {(r.doc_id_1, r.doc_id_2) for r in pairs.collect()}
    assert got == _pair_truth(texts, L)
    assert metrics.filter(F.col("disposition") == "dropped").count() == 0


def test_within_doc_repeat_emits_no_self_pair(spark):
    texts = {1: "zqzq zqzq", 2: "unrelated text"}
    pairs, _, _ = sa.repeated_substring_pairs(
        _df(spark, texts), "doc_id", "text", min_len=4
    )
    assert pairs.count() == 0


def test_group_cap_drops_with_metrics(spark):
    # 6 docs share one viral 8-gram; cap at 3 distinct docs drops it
    viral = "VIRALGR8"
    texts = {i: f"doc{i} {viral} tail{i}" for i in range(6)}
    texts[99] = "no shared content here at all"
    pairs, metrics, _ = sa.repeated_substring_pairs(
        _df(spark, texts), "doc_id", "text", min_len=8, group_cap=3
    )
    dropped = metrics.filter(F.col("disposition") == "dropped").collect()
    assert any(r.n_docs == 6 for r in dropped)
    got = {(r.doc_id_1, r.doc_id_2) for r in pairs.collect()}
    # the viral group's pairs are gone; any surviving pair must come from
    # a sub-cap group — on this corpus there is none
    assert got == set()


def test_dense_rank_boundary_and_passthrough(spark):
    # many duplicate keys across a forced multi-partition range exchange;
    # extra payload column must pass through untouched
    rows = [(i, i % 5, (i * 7) % 3) for i in range(2000)]
    df = spark.createDataFrame(rows, "payload long, k1 long, k2 long")
    ranked, total = sa._dense_rank(df)
    res = ranked.collect()
    keys = sorted({(r.k1, r.k2) for r in rows_iter(rows)})
    truth = {k: i + 1 for i, k in enumerate(keys)}
    assert total == len(keys)
    for r in res:
        assert r.rank == truth[(r.k1, r.k2)]
        assert (r.k1, r.k2) == (r.payload % 5, (r.payload * 7) % 3)
    assert len(res) == 2000


def rows_iter(rows):
    class R:
        def __init__(self, t):
            self.payload, self.k1, self.k2 = t

    return [R(t) for t in rows]
