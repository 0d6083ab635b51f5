"""Spectral-profile (stretch/shift-robust) audio dedup tier — the
invariance contracts behind q101: the |rFFT| band-energy profile must be
exactly phase/shift-invariant, absorb a +-3% playback stretch inside one
log band, and keep the dominant-band signature key stable so the
deterministic candidate join has recall 1.0 on the fixture family."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio import synth_stretch_pcm_udf
from text_similarity_node_spark.operators.audio_fp import (
    audio_profile_pairs,
    spectral_profile_udf,
)

SR = 16000


def _profile_np(x: np.ndarray, n_bands=32, f_lo=100.0, f_hi=4000.0):
    edges = f_lo * (f_hi / f_lo) ** (np.arange(n_bands + 1) / n_bands)
    spec = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    freqs = np.arange(spec.shape[0]) * (SR / x.shape[0])
    idx = np.searchsorted(edges, freqs, side="right")
    e = np.zeros(n_bands)
    v = (idx >= 1) & (idx <= n_bands)
    np.add.at(e, idx[v] - 1, spec[v])
    return e / np.linalg.norm(e)


def _tone(freqs, phase=0.0, amp=0.35, n=SR):
    i = np.arange(n, dtype=np.float64)
    x = sum(amp * np.sin(2 * np.pi * f * i / SR + phase) for f in freqs)
    return np.clip(x * 32767, -32768, 32767).astype("<i2")


def test_profile_phase_and_shift_invariant():
    """|FFT| discards phase: a circular shift / phase offset changes the
    profile by (only) int16 re-quantization noise."""
    a = _profile_np(_tone([440.0, 1200.0]))
    b = _profile_np(_tone([440.0, 1200.0], phase=1.234))
    c = _profile_np(np.roll(_tone([440.0, 1200.0]), 5000))
    assert float(a @ b) > 0.99999
    assert float(a @ c) > 0.999999999  # circular shift: exactly invariant


def test_profile_absorbs_3pct_stretch_but_separates_classes():
    """A band-center tone stretched +-3% stays in its ~5.9%-half-width
    band (cosine ~1); a different band pair is near-orthogonal."""
    ratio = (4000.0 / 100.0) ** (1 / 32)
    f1, f2 = 100.0 * ratio**3.5, 100.0 * ratio**20.5
    base = _profile_np(_tone([f1, f2]))
    stretched = _profile_np(_tone([f1 * 1.03, f2 * 0.97]))
    other = _profile_np(_tone([100.0 * ratio**4.5, 100.0 * ratio**21.5]))
    assert float(base @ stretched) > 0.99
    assert float(base @ other) < 0.1


def test_profile_udf_matches_numpy_and_handles_empty(spark):
    pcm = _tone([440.0, 1200.0]).tobytes()
    df = spark.createDataFrame(
        [(1, pcm, SR), (2, None, SR), (3, b"", SR)], "id long, b binary, sr int"
    )
    rows = {
        r.id: r.p
        for r in df.select(
            "id", spectral_profile_udf()(F.col("b"), F.col("sr")).alias("p")
        ).collect()
    }
    np.testing.assert_allclose(
        np.array(rows[1]), _profile_np(_tone([440.0, 1200.0])), atol=1e-12
    )
    assert rows[2] == [0.0] * 32 and rows[3] == [0.0] * 32


def test_stretch_pairs_exact_on_fixture(spark):
    """q101's operator contract at unit scale: every same-class pair
    (base/base, base/stretched-noisy-copy, copy/copy) is recovered,
    nothing else — recall and precision exactly 1.0."""
    n = 120
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    copies = base.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id")
    )
    corpus = (
        base.unionByName(copies)
        .withColumn("bytes", synth_stretch_pcm_udf()(F.col("doc_id")))
        .withColumn("sr_hz", F.lit(16000))
    )
    got = {
        (r.id1, r.id2)
        for r in audio_profile_pairs(corpus, "doc_id", "bytes").collect()
    }
    ids = [r.doc_id for r in corpus.select("doc_id").collect()]
    byc: dict[int, list[int]] = {}
    for d in ids:
        byc.setdefault(d % 250, []).append(d)
    truth = {
        (a, b)
        for mem in byc.values()
        for i, a in enumerate(sorted(mem))
        for b in sorted(mem)[i + 1 :]
    }
    assert got == truth and len(truth) > 0


def test_hot_key_cap_meters_drops(spark):
    """key_cap drops runaway signature keys WITH metrics, never silently
    (the audio_fingerprint_pairs policy): 40 same-class clips over a
    cap of 10 yield zero pairs and one metered hot-key row."""
    corpus = (
        spark.range(0, 10000, 250)  # 40 ids, all class 0
        .select(F.col("id").alias("doc_id"))
        .withColumn("bytes", synth_stretch_pcm_udf()(F.col("doc_id")))
        .withColumn("sr_hz", F.lit(16000))
    )
    pairs, hot = audio_profile_pairs(
        corpus, "doc_id", "bytes", key_cap=10, return_metrics=True
    )
    hot_rows = hot.collect()
    assert pairs.count() == 0
    assert len(hot_rows) == 1 and hot_rows[0].n_docs == 40
