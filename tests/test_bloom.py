"""Bloom prefilter (operators/bloom.py): parameter math, the
no-false-negative contract, measured FPR vs target, and the composed
decontamination op against a plain exact join."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators import bloom


def test_bloom_params_math():
    m, k = bloom.bloom_params(10_000, 0.01)
    # textbook: ~9.585 bits/key, ~7 probes at 1% FPR
    assert abs(m / 10_000 - 9.585) < 0.1
    assert k == 7
    # degenerate inputs stay sane
    m0, k0 = bloom.bloom_params(0, 0.01)
    assert m0 >= 64 and k0 >= 1


def test_positions_deterministic_and_in_range():
    h = np.arange(-5, 5, dtype=np.int64).view(np.uint64)
    m, k = 1 << 20, 7
    p1 = bloom._positions(h, m, k)
    p2 = bloom._positions(h.copy(), m, k)
    assert p1.shape == (k, 10)
    assert (p1 == p2).all()
    assert (p1 >= 0).all() and (p1 < m).all()


def test_numpy_build_probe_no_false_negatives_and_fpr():
    """Pure-numpy contract check on 50k random uint64 keys: every inserted
    key probes true; FPR on 50k disjoint keys lands near the 1% target."""
    rng = np.random.RandomState(7)
    known = rng.randint(0, 1 << 63, size=50_000, dtype=np.int64)
    other = rng.randint(0, 1 << 63, size=50_000, dtype=np.int64) | (1 << 62)
    other = other[~np.isin(other, known)]
    m, k = bloom.bloom_params(len(known), 0.01)

    bm = np.zeros(m // 8, dtype=np.uint8)
    pos = bloom._positions(known.view(np.uint64), m, k).ravel()
    np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))

    def probe(h):
        p = bloom._positions(h.view(np.uint64), m, k)
        return (((bm[p >> 3] >> (p & 7).astype(np.uint8)) & 1).all(axis=0))

    assert probe(known).all(), "false negative: Bloom contract broken"
    fpr = probe(other).mean()
    assert fpr < 0.03, f"measured FPR {fpr:.4f} far above the 1% target"


def test_spark_build_probe_parity(spark):
    """The distributed bitmap build equals the numpy build, and the probe
    column agrees with exact membership on every row."""
    rng = np.random.RandomState(11)
    known = rng.randint(0, 1 << 62, size=5_000, dtype=np.int64)
    corpus = np.concatenate([known[:500], rng.randint(0, 1 << 62, size=5_000, dtype=np.int64)])
    m, k = bloom.bloom_params(len(known), 0.01)

    kdf = spark.createDataFrame([(int(x),) for x in known], "h long").repartition(8)
    bm = bloom.build_bloom_bitmap(kdf, "h", m, k)

    ref = np.zeros(m // 8, dtype=np.uint8)
    pos = bloom._positions(known.view(np.uint64), m, k).ravel()
    np.bitwise_or.at(ref, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    assert (bm == ref).all(), "distributed OR-reduce differs from numpy build"

    cdf = spark.createDataFrame([(int(x),) for x in corpus], "h long")
    got = (
        cdf.withColumn("hit", bloom.bloom_contains(spark, F.col("h"), bm, m, k))
        .toPandas()
    )
    kset = set(int(x) for x in known)
    for h, hit in zip(got["h"], got["hit"]):
        if int(h) in kset:
            assert hit, f"false negative for inserted key {h}"


def test_bloom_contamination_matches_exact(spark):
    """bloom_contamination_check == contamination_check row-for-row on a
    corpus with planted 13-gram overlaps (the q80 invariant at unit scale)."""
    from text_similarity_node_spark.operators.text_analysis import (
        contamination_check,
    )

    words = [f"w{i}" for i in range(400)]
    bench_rows = [(100 + j, " ".join(words[j * 20 : j * 20 + 20])) for j in range(5)]
    doc_rows = []
    for i in range(60):
        body = " ".join(f"d{i}x{t}" for t in range(30))
        if i % 7 == 3:  # plant: append one benchmark text
            body += " " + bench_rows[i % 5][1]
        doc_rows.append((i, body))
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")

    exact = (
        contamination_check(docs, bench, "doc_id", "text", n=13)
        .orderBy("doc_id")
        .collect()
    )
    got = (
        bloom.bloom_contamination_check(docs, bench, "doc_id", "text", n=13)
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]
    assert len(got) == len([i for i in range(60) if i % 7 == 3])
