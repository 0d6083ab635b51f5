"""DTW warp-robust audio tier (operators/audio_dtw.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio_dtw import (
    band_log_energies,
    dtw_distance,
    dtw_neardup,
    synth_warped_pcm_udf,
)
from text_similarity_node_spark.operators.audio_hk import (
    hk_class_signal,
    hk_subfingerprints,
)

SR = 16000


def _warp(x: np.ndarray, seed: int, seg_len: int = 512) -> np.ndarray:
    rng = np.random.RandomState(seed)
    n_segs = len(x) // seg_len
    i_dup, i_del = rng.choice(n_segs, 2, replace=False)
    segs = [x[i * seg_len : (i + 1) * seg_len] for i in range(n_segs)]
    out = []
    for i, s in enumerate(segs):
        if i == i_del:
            continue
        out.append(s)
        if i == i_dup:
            out.append(s)
    return np.concatenate(out) + 0.002 * rng.randn(len(x))


def test_dtw_identity_and_symmetry_zero():
    a = band_log_energies(hk_class_signal(1), SR)
    assert dtw_distance(a, a) < 1e-9


def test_dtw_separates_warped_copy_from_unrelated():
    x = hk_class_signal(2)
    w = _warp(x, 77)
    fx, fw = band_log_energies(x, SR), band_log_energies(w, SR)
    fo = band_log_energies(hk_class_signal(3), SR)
    assert dtw_distance(fx, fw) < 0.015
    assert dtw_distance(fx, fo) > 0.05


def test_warp_breaks_aligned_ber_but_not_dtw():
    """The capability gap: a locally-warped copy is INVISIBLE to the
    frame-aligned BER verify (q119's regime) and visible to DTW."""
    x = hk_class_signal(4)
    w = _warp(x, 78)
    a, b = hk_subfingerprints(x, SR), hk_subfingerprints(w, SR)
    m = min(len(a), len(b))
    ber = np.mean(
        [bin(int(p) ^ int(q)).count("1") for p, q in zip(a[:m], b[:m])]
    ) / 32
    assert ber > 0.08  # aligned verify cannot keep this pair at any safe threshold
    assert dtw_distance(band_log_energies(x, SR), band_log_energies(w, SR)) < 0.015


def test_band_constraint_rejects_length_mismatch():
    a = band_log_energies(hk_class_signal(5), SR)
    assert dtw_distance(a, a[: len(a) - 10], radius=4) == 1.0


def test_neardup_exact_on_planted_warped_corpus(spark):
    synth = synth_warped_pcm_udf(n_classes=10)
    ids = [(i,) for i in range(30)] + [(1_000_000 + 6 * i,) for i in range(5)]
    df = (
        spark.createDataFrame(ids, "doc_id long")
        .withColumn("bytes", synth(F.col("doc_id")))
        .withColumn("sr_hz", F.lit(SR))
    )
    got = {
        (r.id1, r.id2)
        for r in dtw_neardup(df, "doc_id", "bytes", max_dtw=0.015).collect()
    }
    all_ids = [i for (i,) in ids]
    want = {
        (min(a, b), max(a, b))
        for i, a in enumerate(all_ids)
        for b in all_ids[i + 1 :]
        if a % 10 == b % 10
    }
    assert got == want  # recall and precision both exactly 1.0


def test_batch_dtw_equals_scalar():
    from text_similarity_node_spark.operators.audio_dtw import dtw_distance_batch

    rng = np.random.RandomState(0)
    A = rng.randn(20, 30, 33)
    B = rng.randn(20, 28, 33)
    got = dtw_distance_batch(A, B, radius=4)
    want = [dtw_distance(A[i], B[i], radius=4) for i in range(20)]
    assert np.allclose(got, want, atol=1e-12)
    # same-length pairs and identical pairs
    got2 = dtw_distance_batch(A, A, radius=4)
    assert np.allclose(got2, 0.0, atol=1e-9)
