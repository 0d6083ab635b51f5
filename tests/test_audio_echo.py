"""Echo (2-tap convolutive channel) robustness: echo_pcm_udf transform +
channel-equalized SNR verify (operators/audio.py echofit)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio import (
    decode_pcm_s16le,
    echo_pcm_udf,
    echofit_snr,
    pairwise_snr_echofit_udf,
    snr_db,
)
from text_similarity_node_spark.operators.audio_pitch import pitch_class_bands

SR = 16000
AMPS = (1.0, 0.62, 0.38)


def _chord(cls: int) -> np.ndarray:
    t = np.arange(SR) / SR
    x = np.zeros(SR)
    for a, b in zip(AMPS, pitch_class_bands(cls)):
        x += a * np.sin(2 * np.pi * round(200.0 * 2 ** ((b + 0.5) / 12.0)) * t)
    return np.clip(x / 2.2 * 32767, -32768, 32767).astype("<i2").astype(
        np.float64
    ) / 32768.0


def _echo(x: np.ndarray, gain=0.45, delay=523) -> np.ndarray:
    y = x.copy()
    y[delay:] += gain * x[:-delay]
    y = y / (1 + gain)
    return np.clip(y * 32767, -32768, 32767).astype("<i2").astype(
        np.float64
    ) / 32768.0


def test_echofit_recovers_delay_and_channel():
    for cls in (0, 7, 130):
        x = _chord(cls)
        s, d = echofit_snr(x, _echo(x))
        assert d == 523
        assert s > 40.0
        # the echo copy fails every ALIGNED verify (the capability gap)
        assert snr_db(x, _echo(x)) < 15.0


def test_echofit_rejects_partial_tone_overlap():
    """Classes 0 and 56 share two of three tones; no 2-tap channel can
    synthesize the differing third tone, so the fit is bounded low."""
    s, _ = echofit_snr(_chord(0), _chord(56))
    assert s < 12.0
    s2, _ = echofit_snr(_chord(0), _chord(1))
    assert s2 < 3.0


def test_echofit_identical_and_gain_special_cases():
    x = _chord(3)
    s, _ = echofit_snr(x, x)
    assert s > 80.0  # 2-tap fit includes the identity channel
    s, _ = echofit_snr(x, 0.5 * x)
    assert s > 80.0  # ...and the pure-gain (g1 ~ 0) channel


def test_echo_udf_matches_reference_transform(spark):
    x = _chord(9)
    payload = (np.clip(x * 32768.0, -32768, 32767)).astype("<i2").tobytes()
    df = spark.createDataFrame([(payload,)], ["bytes"])
    got = decode_pcm_s16le(
        df.select(echo_pcm_udf()(F.col("bytes")).alias("b")).collect()[0].b
    )
    want = _echo(x)
    assert np.max(np.abs(got - want)) <= 2.0 / 32768.0  # rounding only


def test_echofit_udf_separates(spark):
    x = _chord(2)
    pb = lambda v: np.clip(v * 32767, -32768, 32767).astype("<i2").tobytes()  # noqa: E731
    df = spark.createDataFrame(
        [(pb(x), pb(_echo(x))), (pb(x), pb(_chord(58)))], ["a", "b"]
    )
    snrs = [
        r.s
        for r in df.select(
            pairwise_snr_echofit_udf()(F.col("a"), F.col("b")).alias("s")
        ).collect()
    ]
    assert snrs[0] > 40.0 and snrs[1] < 12.0


def test_echofit_udf_batch_matches_scalar(spark):
    """The batch-vectorized UDF (unique-payload FFT reuse, stacked
    inverse FFTs) must agree with the scalar echofit_snr per pair."""
    pb = lambda v: np.clip(v * 32767, -32768, 32767).astype("<i2").tobytes()  # noqa: E731
    clips = {c: _chord(c) for c in (0, 1, 56, 57)}
    rows = []
    want = []
    for a in (0, 1, 56):
        for b in (1, 56, 57):
            pair = (pb(clips[a]), pb(_echo(clips[b]) if b == a + 1 else clips[b]))
            rows.append(pair)
            x = np.frombuffer(pair[0], dtype="<i2").astype(np.float64) / 32768.0
            y = np.frombuffer(pair[1], dtype="<i2").astype(np.float64) / 32768.0
            want.append(echofit_snr(x, y)[0])
    df = spark.createDataFrame(rows, ["a", "b"]).coalesce(1)
    got = [
        r.s
        for r in df.select(
            pairwise_snr_echofit_udf()(F.col("a"), F.col("b")).alias("s")
        ).collect()
    ]
    assert got == pytest.approx(want, rel=1e-9)


def test_reencode_composite_passes_channel_fit(spark):
    """Gain x shift x dither in one copy: plain and best-gain SNR both
    fail, the channel fit absorbs the composition (g0 -> 0, tap at the
    shift lag)."""
    from text_similarity_node_spark.operators.audio import (
        pairwise_snr_bestgain_udf,
        reencode_pcm_udf,
    )

    x = _chord(5)
    payload = np.clip(x * 32768.0, -32768, 32767).astype("<i2").tobytes()
    df = spark.createDataFrame([(payload,)], ["a"]).withColumn(
        "b", reencode_pcm_udf()(F.col("a"))
    )
    row = df.select(
        pairwise_snr_echofit_udf()(F.col("a"), F.col("b")).alias("fit"),
        pairwise_snr_bestgain_udf(F.col("a"), F.col("b")).alias("bg"),
    ).collect()[0]
    assert row.fit > 30.0
    assert row.bg < 10.0  # best-gain cannot absorb the shift
