"""ICWS weighted MinHash (operators/weighted_minhash.py, q76's engine).

Pins the three load-bearing properties:
- unbiasedness: slot-agreement ≈ weighted Jaccard J_w within 4σ;
- weight sensitivity: identical token SETS with very different weights
  must NOT agree (the exact failure mode of unweighted MinHash);
- the empty/sentinel contract matches unweighted MinHash (band_hashes
  emits no bands), and banding over ICWS signatures recalls planted
  weighted near-dups through the production salted join.
"""

import math

import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.config import PipelineConfig
from text_similarity_node_spark.operators import lsh, minhash
from text_similarity_node_spark.operators.weighted_minhash import (
    with_weighted_minhash,
)


def _sig_rows(spark, rows, k, seed=7):
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, weights array<long>"
    )
    out = with_weighted_minhash(df, "tokens", "weights", k=k, seed=seed)
    return {r.doc_id: r.wminhash for r in out.collect()}


def _jw(wa: dict, wb: dict) -> float:
    toks = set(wa) | set(wb)
    num = sum(min(wa.get(t, 0), wb.get(t, 0)) for t in toks)
    den = sum(max(wa.get(t, 0), wb.get(t, 0)) for t in toks)
    return num / den


def test_agreement_estimates_weighted_jaccard(spark):
    k = 2048
    toks = [f"t{i}" for i in range(60)]
    wa = {t: (37 * i + 11) % 1000 + 1 for i, t in enumerate(toks)}
    wb = {t: ((53 * i + 5) % 1400 + 1 if i % 4 else 0) for i, t in enumerate(toks)}
    rows = [
        (1, list(wa), [wa[t] for t in wa]),
        (2, [t for t in wb if wb[t] > 0], [wb[t] for t in wb if wb[t] > 0]),
    ]
    sigs = _sig_rows(spark, rows, k)
    est = sum(a == b for a, b in zip(sigs[1], sigs[2])) / k
    jw = _jw(wa, {t: w for t, w in wb.items() if w > 0})
    se = math.sqrt(jw * (1 - jw) / k)
    assert abs(est - jw) <= 4 * se, (est, jw, 4 * se)


def test_weight_sensitivity_same_token_sets(spark):
    """Same 50-token SET, weights 1 vs 1000: set-Jaccard (and therefore
    unweighted MinHash agreement) is 1.0, but J_w = 0.001 — ICWS slots
    must disagree almost everywhere, or the operator is just MinHash."""
    k = 512
    toks = [f"s{i}" for i in range(50)]
    rows = [
        (1, toks, [1] * 50),
        (2, toks, [1000] * 50),
        (3, toks, [1] * 50),  # true copy of doc 1
    ]
    sigs = _sig_rows(spark, rows, k)
    agree_12 = sum(a == b for a, b in zip(sigs[1], sigs[2])) / k
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3])) / k
    assert agree_13 == 1.0
    assert agree_12 < 0.1, agree_12


def test_scale_invariance_of_common_factor(spark):
    """J_w is invariant under scaling BOTH docs by the same factor; the
    estimator should track that (weights 1x vs 1000x on both sides give
    statistically indistinguishable agreement)."""
    k = 1024
    toks = [f"c{i}" for i in range(40)]
    w1 = [(i % 7) + 1 for i in range(40)]
    w2 = [(i % 5) + 1 for i in range(40)]
    lo = _sig_rows(spark, [(1, toks, w1), (2, toks, w2)], k)
    hi = _sig_rows(
        spark, [(1, toks, [w * 1000 for w in w1]), (2, toks, [w * 1000 for w in w2])], k
    )
    a_lo = sum(a == b for a, b in zip(lo[1], lo[2])) / k
    a_hi = sum(a == b for a, b in zip(hi[1], hi[2])) / k
    assert abs(a_lo - a_hi) < 0.08, (a_lo, a_hi)


def test_sentinel_and_no_bands(spark):
    rows = [(1, [], []), (2, ["x"], [0]), (3, ["y"], [5])]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, weights array<long>"
    )
    sig = with_weighted_minhash(df, "tokens", "weights", k=8, seed=1)
    got = {r.doc_id: r.wminhash for r in sig.collect()}
    assert got[1] == [-1] * 8  # empty
    assert got[2] == [-1] * 8  # all weights <= 0
    assert got[3] != [-1] * 8
    cfg = PipelineConfig(minhash_k=8, lsh_bands=4, lsh_rows=2)
    bands = minhash.explode_bands(
        sig.select("doc_id", "wminhash"), "doc_id", "wminhash", cfg
    )
    per_doc = {
        r.doc_id: r.n
        for r in bands.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert 1 not in per_doc and 2 not in per_doc
    assert per_doc[3] == 4


def test_banding_recalls_planted_weighted_neardups(spark):
    """Production shape end-to-end: planted high-J_w pairs all surface
    from the salted band join; the unrelated-doc pair volume stays far
    below all-pairs."""
    base = {f"w{i}": 100 + i for i in range(80)}
    rows = []
    truth = set()
    for d in range(30):
        toks = {f"d{d}_{j}": 50 + j for j in range(60)}
        rows.append((d, list(toks), list(toks.values())))
    for d in range(30, 40):  # 10 planted pairs vs doc 0's template
        toks = dict(base)
        for j in range(4):
            toks[f"n{d}_{j}"] = 77  # small perturbation
        rows.append((d, list(toks), list(toks.values())))
    rows.append((99, list(base), list(base.values())))
    for d in range(30, 40):
        truth.add((d, 99))
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, weights array<long>"
    )
    cfg = PipelineConfig(
        minhash_k=64, lsh_bands=32, lsh_rows=2, hot_band_threshold=500
    )
    sig = with_weighted_minhash(df, "tokens", "weights", k=64, seed=99)
    bands = minhash.explode_bands(
        sig.select("doc_id", "wminhash"), "doc_id", "wminhash", cfg
    )
    pairs, _ = lsh.candidate_pairs(bands, cfg, id_col="doc_id")
    got = {(r.id1, r.id2) for r in pairs.collect()}
    missing = truth - got
    assert not missing, missing
    assert len(got) < 41 * 40 / 4  # nowhere near all-pairs
