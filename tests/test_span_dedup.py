"""Exact-substring span dedup: hand-built coverage cases (overlap merge,
adjacency, within-doc repeats, sub-W docs) against brute force."""

from pyspark.sql import functions as F  # noqa: F401

from text_similarity_node_spark.operators.span_dedup import (
    duplicated_span_coverage,
)


def _brute(rows, w):
    """Brute-force coverage: flag windows whose text occurs >= 2 times
    across all (doc, pos), union covered indices per doc."""
    wins = {}
    for did, toks in rows:
        for p in range(len(toks) - w + 1):
            key = " ".join(toks[p : p + w])
            wins.setdefault(key, []).append((did, p))
    covered = {}
    for key, occ in wins.items():
        if len(occ) < 2:
            continue
        for did, p in occ:
            covered.setdefault(did, set()).update(range(p, p + w))
    return {
        did: (len(toks), len(covered[did]))
        for did, toks in rows
        if did in covered
    }


def _run(spark, rows, w):
    df = spark.createDataFrame(rows, "id int, toks array<string>")
    got = {
        r["id"]: (r["n_tokens"], r["n_covered"])
        for r in duplicated_span_coverage(df, "id", "toks", w=w).collect()
    }
    assert got == _brute(rows, w), got


def test_disjoint_and_overlapping_islands(spark):
    shared1 = [f"a{i}" for i in range(4)]
    shared2 = [f"b{i}" for i in range(5)]  # overlapping occurrences below
    rows = [
        # doc 0: shared1 at p=0, shared2 at p=10 (disjoint islands)
        (0, shared1 + [f"x{i}" for i in range(6)] + shared2 + ["x9"]),
        # doc 1: shared1 at p=2
        (1, ["y0", "y1"] + shared1 + [f"y{i}" for i in range(2, 8)]),
        # doc 2: shared2 twice, overlapping windows merge into one island
        (2, shared2 + shared2 + ["z0"]),
        # doc 3: no repeats
        (3, [f"q{i}" for i in range(12)]),
    ]
    _run(spark, rows, w=3)


def test_within_doc_repeat_counts(spark):
    # the same window twice INSIDE one doc is a repeat (2 occurrences)
    block = ["r0", "r1", "r2"]
    rows = [
        (0, block + ["m0"] + block + ["m1", "m2"]),
        (1, [f"n{i}" for i in range(9)]),
    ]
    _run(spark, rows, w=3)


def test_short_docs_skipped(spark):
    rows = [
        (0, ["a", "b"]),  # < w tokens: no windows
        (1, ["a", "b"]),
    ]
    _run(spark, rows, w=3)


def test_exact_dup_docs_fully_covered(spark):
    text = [f"t{i}" for i in range(10)]
    rows = [(0, text), (1, list(text)), (2, [f"u{i}" for i in range(10)])]
    df = duplicated_span_coverage(
        spark.createDataFrame(rows, "id int, toks array<string>"),
        "id", "toks", w=4,
    )
    got = {r["id"]: (r["n_tokens"], r["n_covered"]) for r in df.collect()}
    assert got == {0: (10, 10), 1: (10, 10)}
