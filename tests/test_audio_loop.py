"""audio_loop_stats: intra-clip loop/stutter detection (the q108 family)."""

from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio import synth_loop_pcm_udf
from text_similarity_node_spark.operators.audio_fp import audio_loop_stats

_KW = dict(frame_len=2048, hop=1024, peaks_per_frame=1,
           fanout=2, freq_quant_hz=1.0)


def test_flags_exactly_planted_loops(spark):
    docs = (
        spark.range(120).select(F.col("id").alias("doc_id"))
        .withColumn("bytes", synth_loop_pcm_udf()(F.col("doc_id")))
        .withColumn("sr_hz", F.lit(16000))
    )
    rows = audio_loop_stats(docs, "doc_id", "bytes", "sr_hz",
                            rep_threshold_micro=300_000, **_KW).collect()
    assert len(rows) == 120
    for r in rows:
        assert r.is_looped == (r.doc_id % 3 == 0), r
        # diagnostics are consistent by definition
        assert r.n_hashes <= r.n_landmarks
        assert r.rep_micro == (r.n_landmarks - r.n_hashes) * 1_000_000 // r.n_landmarks


def test_short_payload_is_clean(spark):
    docs = spark.createDataFrame(
        [(1, b"\x00\x00", 16000)], "doc_id long, bytes binary, sr_hz int"
    )
    r = audio_loop_stats(docs, "doc_id", "bytes", "sr_hz", **_KW).collect()[0]
    assert r.n_landmarks == 0 and r.rep_micro == 0 and not r.is_looped
