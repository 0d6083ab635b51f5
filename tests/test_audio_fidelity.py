"""Per-row fidelity (BASELINE.json input_hint): decoded-PCM allclose
(SNR >= 30 dB) + transcript equality between pipeline output rows and
source rows; audio operator plumbing."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio import (
    decode_clip,
    decode_pcm_s16le,
    frame_sample_udf,
    pairwise_snr_udf,
    rms_energy_udf,
    snr_db,
)
from text_similarity_node_spark.sources.clips import ClipsSpec, generate_clips

SPEC = ClipsSpec(n_clips=80, seed=5)


def test_pipeline_rows_preserve_payloads(spark):
    """Rows that flow through a select/filter/join pipeline carry
    byte-identical audio and transcripts (the engine never mutates them)."""
    clips, _ = generate_clips(spark, SPEC)
    clips = clips.cache()
    src = {r.clip_id: r for r in clips.collect()}
    # a representative pipeline: prune -> compute -> join payload back
    out = (
        clips.select("clip_id", "transcript")
        .withColumn("n", F.length("transcript"))
        .join(clips.select("clip_id", "bytes", "sr_hz"), "clip_id")
        .collect()
    )
    assert len(out) == SPEC.n_clips
    for r in out:
        s = src[r.clip_id]
        assert r.transcript == s.transcript
        a = decode_pcm_s16le(bytes(s.bytes))
        b = decode_pcm_s16le(bytes(r.bytes))
        assert len(a) == len(b)
        assert snr_db(a, b) == float("inf")  # byte-identical


def test_cluster_members_snr_ge_30db(spark):
    """Near-dup members share the cluster waveform at SNR >= 30 dB (the
    generator's jitter bound) — verified with the Arrow SNR kernel."""
    clips, truth = generate_clips(spark, SPEC)
    member = clips.join(truth, "clip_id")
    base = member.groupBy("true_cluster_id").agg(
        F.min("clip_id").alias("base_id")
    )
    pairs = (
        member.join(base, "true_cluster_id")
        .filter(F.col("clip_id") != F.col("base_id"))
        .join(
            clips.select(F.col("clip_id").alias("base_id"), F.col("bytes").alias("ref_bytes")),
            "base_id",
        )
        .withColumn("snr", pairwise_snr_udf(F.col("ref_bytes"), F.col("bytes")))
    )
    rows = pairs.select("clip_id", "snr").collect()
    assert rows
    for r in rows:
        assert r.snr >= 30.0, f"{r.clip_id}: SNR {r.snr:.1f} dB < 30"


def test_rms_and_frames_udfs(spark):
    clips, _ = generate_clips(spark, SPEC)
    out = (
        clips.limit(10)
        .withColumn("rms", rms_energy_udf(F.col("bytes")))
        .withColumn("frames", frame_sample_udf()(F.col("bytes"), F.col("sr_hz")))
        .collect()
    )
    for r in out:
        assert 0.1 < r.rms < 1.0  # two-sine signal
        assert len(r.frames) > 5
        assert all(0.0 <= v <= 1.0 for v in r.frames)


def test_decode_stub_contract():
    import pytest

    x = np.array([0, 16384, -16384], dtype="<i2").tobytes()
    dec = decode_clip(x, "pcm_s16le")
    assert np.allclose(dec, [0.0, 0.5, -0.5])
    with pytest.raises(NotImplementedError):
        decode_clip(x, "opus")


def test_resample_identity_and_validation():
    from text_similarity_node_spark.operators.audio import resample_pcm

    x = np.sin(2 * np.pi * 440.0 * np.arange(16000) / 16000.0)
    same = resample_pcm(x, 16000, 16000)
    assert np.array_equal(same, x) and same is not x  # copy, not alias
    assert resample_pcm(np.empty(0), 8000, 16000).shape == (0,)
    for bad in [(0, 16000), (16000, -1)]:
        try:
            resample_pcm(x, *bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
    try:
        resample_pcm(x, 16000, 8000, taps=128)
        raise AssertionError("expected ValueError for even taps")
    except ValueError:
        pass


def test_resample_roundtrip_snr_ge_30db():
    """The north-rule fidelity invariant applied to the resampler itself:
    a bandlimited signal survives 16k -> 8k -> 16k with SNR >= 30 dB and
    sample alignment (no group delay), for both pure tones and a
    multi-tone melody-like mix."""
    from text_similarity_node_spark.operators.audio import resample_pcm, snr_db

    sr = 16000
    i = np.arange(sr, dtype=np.float64)
    for freqs in [(440.0,), (523.0, 1021.0, 2963.0)]:
        x = sum(0.3 * np.sin(2 * np.pi * f * i / sr) for f in freqs)
        y8 = resample_pcm(x, 16000, 8000)
        assert len(y8) == sr // 2
        y16 = resample_pcm(y8, 8000, 16000)
        assert len(y16) == sr
        # trim filter edge effects (one kernel length each side)
        s = slice(256, sr - 256)
        assert snr_db(x[s], y16[s]) >= 30.0


def test_resample_attenuates_not_aliases():
    """A 5 kHz tone downsampled to 8 kHz (Nyquist 4 kHz) must come back
    attenuated, NOT folded to 3 kHz: total surviving energy is a small
    fraction of the input's, which a linear-interp decimator (the old
    stub) fails by a wide margin."""
    from text_similarity_node_spark.operators.audio import resample_pcm

    sr = 16000
    i = np.arange(sr, dtype=np.float64)
    x = np.sin(2 * np.pi * 5000.0 * i / sr)
    y = resample_pcm(x, 16000, 8000)[128:-128]
    # energy per sample, relative to the tone's 0.5
    assert (y**2).mean() < 0.01 * 0.5


def test_resample_rational_ratio_44k1_to_16k():
    """Non-power-of-two ratio (44100 -> 16000, L/M = 160/441): length and
    tone frequency preserved."""
    from text_similarity_node_spark.operators.audio import resample_pcm

    sr_from, sr_to = 44100, 16000
    n = 22050
    i = np.arange(n, dtype=np.float64)
    x = np.sin(2 * np.pi * 1000.0 * i / sr_from)
    y = resample_pcm(x, sr_from, sr_to)
    assert abs(len(y) - n * sr_to / sr_from) <= 1
    # dominant FFT bin of the interior == 1000 Hz within one bin width
    mid = y[512 : 512 + 4096]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak_hz = np.argmax(spec) * sr_to / len(mid)
    assert abs(peak_hz - 1000.0) <= sr_to / len(mid)


def test_resample_udf_passthrough_and_convert(spark):
    """The canonicalization UDF: rows already at the target rate are
    bit-exact pass-throughs; mixed-rate rows come back at the target
    rate with the right sample count and >= 30 dB fidelity."""
    from text_similarity_node_spark.operators.audio import (
        resample_pcm_udf,
        snr_db,
    )

    sr = 16000
    i = np.arange(sr, dtype=np.float64)
    x16 = (0.4 * np.sin(2 * np.pi * 880.0 * i / sr) * 32767).astype("<i2")
    i8 = np.arange(sr // 2, dtype=np.float64)
    x8 = (0.4 * np.sin(2 * np.pi * 880.0 * i8 / 8000.0) * 32767).astype("<i2")
    df = spark.createDataFrame(
        [(1, bytearray(x16.tobytes()), 16000), (2, bytearray(x8.tobytes()), 8000)],
        "id long, bytes binary, sr_hz int",
    )
    rows = {
        r.id: bytes(r.out)
        for r in df.withColumn(
            "out", resample_pcm_udf(16000)(F.col("bytes"), F.col("sr_hz"))
        ).collect()
    }
    assert rows[1] == x16.tobytes()  # bit-exact pass-through
    y = np.frombuffer(rows[2], dtype="<i2").astype(np.float64)
    assert len(y) == sr
    ref = 0.4 * np.sin(2 * np.pi * 880.0 * i / sr) * 32767
    s = slice(256, sr - 256)
    assert snr_db(ref[s], y[s]) >= 30.0


def test_polarity_snr_udf_restores_inverted_pairs(spark):
    """x vs -x: raw SNR ~ -6.02 dB (noise = 2x), polarity-aware = inf."""
    from pyspark.sql import functions as F

    from text_similarity_node_spark.operators.audio import (
        gain_pcm_udf,
        pairwise_snr_polarity_udf,
        pairwise_snr_udf,
        synth_sine1s_pcm_udf,
    )

    df = (
        spark.range(5).select(F.col("id").alias("doc_id"))
        .withColumn("a", synth_sine1s_pcm_udf()(F.col("doc_id")))
        .withColumn("b", gain_pcm_udf(-1.0)(F.col("a")))
        .select(
            pairwise_snr_udf("a", "b").alias("raw"),
            pairwise_snr_polarity_udf("a", "b").alias("pol"),
            pairwise_snr_polarity_udf("a", "a").alias("same"),
        )
    )
    for r in df.collect():
        assert abs(r.raw - (-6.0206)) < 0.01
        assert r.pol == float("inf")
        assert r.same == float("inf")
