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
