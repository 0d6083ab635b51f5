"""Acoustic-fingerprint dedup: recover the planted clip clusters from the
WAVEFORMS alone (no transcript) — candidates from spectral landmarks, exact
pairwise-SNR verify."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio_fp import (
    audio_fingerprint_pairs,
    audio_landmarks_udf,
    audio_neardup,
)
from text_similarity_node_spark.sources.clips import ClipsSpec, generate_clips

FP_KW = dict(
    frame_len=2048, hop=1024, peaks_per_frame=2, fanout=1, freq_quant_hz=2.0
)


def _truth_pairs(truth):
    a = truth.select(
        F.col("clip_id").alias("id1"), F.col("true_cluster_id").alias("c1")
    )
    b = truth.select(
        F.col("clip_id").alias("id2"), F.col("true_cluster_id").alias("c2")
    )
    return (
        a.join(b, (F.col("c1") == F.col("c2")) & (F.col("id1") < F.col("id2")))
        .select("id1", "id2")
    )


def test_audio_neardup_recovers_planted_clusters(spark):
    clips, truth = generate_clips(spark, ClipsSpec(n_clips=400, seed=13))
    clips = clips.cache()
    found = audio_neardup(
        clips, "clip_id", "bytes", "sr_hz", snr_threshold_db=20.0, **FP_KW
    ).select("id1", "id2").cache()
    tp = _truth_pairs(truth).cache()
    n_truth = tp.count()
    n_found = found.count()
    n_hit = tp.join(found, ["id1", "id2"], "left_semi").count()
    assert n_truth > 0
    # recall: landmark candidates + SNR verify recover the same-recording
    # pairs from audio alone
    assert n_hit / n_truth >= 0.99, (n_hit, n_truth)
    # precision: the SNR verify admits no cross-cluster pair (different
    # two-sine waveforms sit far below 0 dB against each other)
    assert n_found == n_hit, (n_found, n_hit)


def test_fingerprint_pairs_cap_is_metered(spark):
    """Hot landmark hashes are dropped with metrics rows, never silently:
    force every hash hot with cap=0 and check the pair set empties while
    the metrics side reports the dropped hashes."""
    clips, _ = generate_clips(spark, ClipsSpec(n_clips=60, seed=5))
    pairs, hot = audio_fingerprint_pairs(
        clips, "clip_id", "bytes", "sr_hz", hash_cap=0, return_metrics=True,
        **FP_KW,
    )
    assert pairs.count() == 0
    assert hot.count() > 0
    assert {"h", "n_docs"} <= set(hot.columns)


def test_multimodal_neardup_catches_corrupted_transcripts(spark):
    """Replace some dup-cluster members' transcripts with garbage
    (simulating transcription failure): the text path alone misses those
    pairs, the audio path recovers them, and the multimodal union
    clusters everything back to the planted truth."""
    from pyspark.sql import functions as F2

    from text_similarity_node_spark.config import PipelineConfig
    from text_similarity_node_spark.operators.dedup import (
        multimodal_neardup,
        neardup_dedup,
    )

    clips, truth = generate_clips(spark, ClipsSpec(n_clips=300, seed=21))
    # corrupt every 5th clip's transcript (deterministic).  The garbage
    # must be mutually DISSIMILAR — a shared "transcription failed ..."
    # template would make the corrupted clips near-dups of each other in
    # text space; a per-clip sha2 hex blob keeps pairwise multiset-J ~0.
    corrupted = clips.withColumn(
        "transcript",
        F2.when(
            F2.xxhash64("clip_id") % 5 == 0,
            F2.sha2(F2.concat(F2.col("clip_id"), F2.lit("corrupt")), 256),
        ).otherwise(F2.col("transcript")),
    ).cache()
    cfg = PipelineConfig(
        verify_threshold=0.8, hot_band_threshold=100, salt_buckets=4,
        run_id="mm",
    )

    def clusters_of(df):
        out = {}
        for r in df.select("clip_id", "cluster_id").collect():
            out.setdefault(r.cluster_id, set()).add(r.clip_id)
        return {frozenset(v) for v in out.values() if len(v) > 1}

    want = {}
    for r in truth.collect():
        want.setdefault(r.true_cluster_id, set()).add(r.clip_id)
    want = {frozenset(v) for v in want.values() if len(v) > 1}

    text_only = clusters_of(
        neardup_dedup(corrupted, "clip_id", "transcript", cfg)
    )
    multi = clusters_of(
        multimodal_neardup(corrupted, cfg, audio_fp_kwargs=FP_KW)
    )
    assert text_only != want  # corruption really breaks the text path
    assert multi == want      # the audio edges repair it


def test_landmarks_shift_invariant_on_nonstationary_clip(spark):
    """A one-hop time shift of a NON-stationary melody keeps >= 2 interior
    landmark hashes (relative (f1, f2, dt) anchoring), while a different
    class shares none — the q51 construction at operator level."""
    import pandas as pd

    from text_similarity_node_spark.operators.audio import (
        synth_melody_pcm_udf,
    )

    ids = [5, 1_000_005, 17]  # base, its shifted copy, other class
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids})).select(
        "doc_id",
        synth_melody_pcm_udf()(F.col("doc_id")).alias("bytes"),
        F.lit(16000).alias("sr_hz"),
    )
    rows = df.select(
        "doc_id",
        audio_landmarks_udf(
            frame_len=4096, hop=2048, peaks_per_frame=1, fanout=2,
            freq_quant_hz=1.0,
        )(F.col("bytes"), F.col("sr_hz")).alias("h"),
    ).collect()
    h = {r.doc_id: set(r.h) for r in rows}
    assert len(h[5] & h[1_000_005]) >= 2   # shift survives
    assert not (h[5] & h[17])              # classes stay disjoint


def test_vardur_synth_contract(spark):
    """The variable-duration synth behind the q98 savings report: sample
    count divisible by 16 (so ms = len(bytes)/32 is exact), a noisy copy
    has EXACTLY its source's length, and the copy stays within the
    generator's SNR >= 30 dB 'same recording' bound."""
    import numpy as np
    import pandas as pd

    from text_similarity_node_spark.operators.audio import (
        snr_db,
        synth_sine_vardur_pcm_udf,
    )

    ids = [7, 1_000_007, 399, 1_000_399, 0, 1_000_000]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids})).select(
        "doc_id", synth_sine_vardur_pcm_udf()(F.col("doc_id")).alias("bytes")
    )
    b = {r.doc_id: r.bytes for r in df.collect()}
    for d, payload in b.items():
        n = len(payload) // 2
        assert n == 12000 + (d % 400) * 16
        assert len(payload) % 32 == 0
    for base in (7, 399, 0):
        copy = base + 1_000_000
        assert len(b[base]) == len(b[copy])
        ref = np.frombuffer(b[base], dtype="<i2").astype(np.float64)
        tst = np.frombuffer(b[copy], dtype="<i2").astype(np.float64)
        assert snr_db(ref, tst) >= 30.0
