"""Haitsma-Kalker fingerprint operator (operators/audio_hk.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio_hk import (
    hk_candidate_pairs,
    hk_fingerprint_udf,
    hk_neardup,
    hk_subfingerprints,
    synth_hk_pcm_udf,
)

SR = 16000


def _clip(seed: int, n: int = 16384) -> np.ndarray:
    # BROADBAND test signal (40 sines): the HK scheme's intended domain —
    # with 33 narrow bands, a sparse tonal clip leaves most bands at the
    # noise floor and their sign bits ride on noise (that regime belongs
    # to the landmark fingerprint, audio_fp.py).
    rng = np.random.RandomState(seed)
    t = np.arange(n) / SR
    x = np.zeros(n)
    for f in rng.uniform(300, 6000, 40):
        x += rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * f * t)
    # per-segment amplitude modulation so temporal energy diffs are nonzero
    gains = np.repeat(rng.uniform(0.3, 1.0, n // 512), 512)
    return x * gains / 40.0


def test_determinism_and_shape():
    x = _clip(1)
    a = hk_subfingerprints(x, SR)
    b = hk_subfingerprints(x, SR)
    assert np.array_equal(a, b)
    n_frames = (len(x) - 512) // 512 + 1
    assert len(a) == n_frames - 1
    assert all(0 <= v < (1 << 32) for v in a)  # 33 bands -> 32-bit words


def test_gain_invariance_exact():
    x = _clip(2)
    assert np.array_equal(
        hk_subfingerprints(x, SR), hk_subfingerprints(0.37 * x, SR)
    )  # sign bits are scale-invariant


def test_noise_robust_vs_unrelated():
    x = _clip(3)
    noisy = x + 0.002 * np.random.RandomState(9).randn(len(x))
    other = _clip(4)
    fx, fn, fo = (hk_subfingerprints(v, SR) for v in (x, noisy, other))

    def ber(a, b):
        return np.mean([bin(int(p) ^ int(q)).count("1") for p, q in zip(a, b)]) / 32

    assert ber(fx, fn) < 0.1
    assert ber(fx, fo) > 0.35


def test_short_payload_empty():
    assert len(hk_subfingerprints(np.zeros(100), SR)) == 0


def test_neardup_exact_on_planted_corpus(spark):
    synth = synth_hk_pcm_udf(n_classes=10)
    ids = [(i,) for i in range(30)] + [(1_000_000 + 6 * i,) for i in range(5)]
    df = (
        spark.createDataFrame(ids, "doc_id long")
        .withColumn("bytes", synth(F.col("doc_id")))
        .withColumn("sr_hz", F.lit(SR))
    )
    got = {
        (r.id1, r.id2)
        for r in hk_neardup(df, "doc_id", "bytes", max_ber=0.25).collect()
    }
    all_ids = [i for (i,) in ids]
    want = {
        (min(a, b), max(a, b))
        for i, a in enumerate(all_ids)
        for b in all_ids[i + 1 :]
        if a % 10 == b % 10
    }
    assert got == want  # recall and precision both exactly 1.0


def test_hot_word_cap_metrics(spark):
    # identical constant-spectrum clips: every word shared by all 80 rows
    x = _clip(5)
    payload = bytes(np.clip(x * 32767, -32768, 32767).astype("<i2").tobytes())
    df = spark.createDataFrame(
        [(i, payload, SR) for i in range(80)], "rid long, bytes binary, sr_hz int"
    )
    fps = df.select(
        "rid", hk_fingerprint_udf()(F.col("bytes"), F.col("sr_hz")).alias("fp")
    )
    pairs, hot = hk_candidate_pairs(fps, "rid", "fp", word_cap=64, return_metrics=True)
    assert pairs.count() == 0  # all words hot -> no junk pair explosion
    hot_rows = hot.collect()
    assert hot_rows and all(r.n_docs == 80 for r in hot_rows)  # metered, not silent
