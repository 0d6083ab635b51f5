"""Prefix-filter similarity join: exactness (recall 1.0 by construction)
against brute force, on both hand-built and generated token sets."""

import itertools
import random

from pyspark.sql import functions as F

from text_similarity_node_spark.operators.simjoin import prefix_filter_jaccard_join


def _brute(rows, t):
    out = set()
    for (i1, tk1), (i2, tk2) in itertools.combinations(rows, 2):
        s1, s2 = set(tk1), set(tk2)
        if not s1 or not s2:
            continue
        j = len(s1 & s2) / len(s1 | s2)
        if j >= t:
            out.add(tuple(sorted((i1, i2))))
    return out


def test_exact_recall_random_sets(spark):
    random.seed(7)
    vocab = [f"t{i}" for i in range(50)]
    rows = []
    for i in range(120):
        base = random.sample(vocab, random.randint(3, 12))
        rows.append((i, base))
        if random.random() < 0.4:  # planted near-dup
            mut = base.copy()
            if len(mut) > 3 and random.random() < 0.5:
                mut.pop()
            else:
                mut.append(random.choice(vocab))
            rows.append((i + 1000, list(dict.fromkeys(mut))))
    df = spark.createDataFrame(rows, "rid int, tokens array<string>")
    t = 0.7
    got = {
        tuple(sorted((r.id1, r.id2)))
        for r in prefix_filter_jaccard_join(df, "rid", "tokens", t).collect()
    }
    expected = _brute(rows, t)
    assert got == expected, (
        f"missed={sorted(expected - got)[:5]} extra={sorted(got - expected)[:5]}"
    )


def test_jaccard_values_match(spark):
    rows = [(1, ["a", "b", "c"]), (2, ["a", "b", "c", "d"]), (3, ["x", "y"])]
    df = spark.createDataFrame(rows, "rid int, tokens array<string>")
    out = {(r.id1, r.id2): r.jaccard for r in
           prefix_filter_jaccard_join(df, "rid", "tokens", 0.5).collect()}
    assert out == {(1, 2): 0.75}


# ---------------------------------------------------------------------------
# asymmetric set-containment join
# ---------------------------------------------------------------------------

from text_similarity_node_spark.operators.simjoin import containment_join


def _brute_containment(rows, t, min_size):
    out = {}
    for (ia, ta), (ib, tb) in itertools.permutations(rows, 2):
        sa, sb = set(ta), set(tb)
        if len(sa) < min_size:
            continue
        isz = len(sa & sb)
        if isz * 1_000_000 >= round(t * 1_000_000) * len(sa):
            out[(ia, ib)] = (isz, isz * 1_000_000 // len(sa))
    return out


def test_containment_directed_and_exact(spark):
    rows = [
        (1, ["a", "b", "c", "d", "e"]),                     # quote
        (2, ["a", "b", "c", "d", "e", "f", "g", "h", "x",
             "y", "z", "w", "v", "u", "t"]),                # page holding it
        (3, ["p", "q", "r", "s", "k"]),                      # unrelated
        (4, ["a", "b"]),                                     # under min_size
    ]
    df = spark.createDataFrame(rows, "rid int, tokens array<string>")
    got = {
        (r.contained_id, r.container_id): (r.isz, r.containment_micro)
        for r in containment_join(df, "rid", "tokens", 0.8, min_size=5).collect()
    }
    # 1 ⊂ 2 (containment 1.0) but NOT 2 ⊂ 1 (5/15 < 0.8); 4 gated out.
    assert got == {(1, 2): (5, 1_000_000)}


def test_containment_recall_random(spark):
    random.seed(11)
    vocab = [f"t{i}" for i in range(40)]
    rows = []
    for i in range(80):
        rows.append((i, random.sample(vocab, random.randint(2, 15))))
        if random.random() < 0.3:  # plant a superset container
            extra = [w for w in vocab if w not in rows[-1][1]]
            rows.append(
                (i + 1000,
                 rows[-1][1] + random.sample(extra, min(5, len(extra))))
            )
    df = spark.createDataFrame(rows, "rid int, tokens array<string>")
    t, ms = 0.7, 3
    got = {
        (r.contained_id, r.container_id): (r.isz, r.containment_micro)
        for r in containment_join(df, "rid", "tokens", t, min_size=ms).collect()
    }
    assert got == _brute_containment(rows, t, ms)
