"""audio_set_minhash_pairs: the MinHash-over-landmark-sets tier.

Checks the property the raw landmark equi-join cannot give: a landmark
hash shared by a whole class survives candidate generation (the sketch
sees sets, the band join sees bounded-fan-out band keys), and the exact
set-Jaccard verify keeps precision 1.0."""

from pyspark.sql import functions as F

from text_similarity_node_spark.config import PipelineConfig
from text_similarity_node_spark.operators.audio import synth_shared_pcm_udf
from text_similarity_node_spark.operators.audio_fp import (
    audio_landmarks_udf,
    audio_set_minhash_pairs,
)

_LM_KW = dict(frame_len=2048, hop=1024, peaks_per_frame=1,
              fanout=2, freq_quant_hz=1.0)


def _corpus(spark, n):
    return (
        spark.range(n).select(F.col("id").alias("doc_id"))
        .withColumn("bytes", synth_shared_pcm_udf()(F.col("doc_id")))
        .withColumn("sr_hz", F.lit(16000))
    )


def test_recall_and_precision_exact(spark):
    docs = _corpus(spark, 200)  # 25 classes x 8 members
    got = {
        (r.id1, r.id2): (r.isz, r.jac_micro)
        for r in audio_set_minhash_pairs(
            docs, "doc_id", "bytes", "sr_hz", threshold=0.3, **_LM_KW
        ).collect()
    }
    expected = {
        (a, b): (6, 428571)
        for a in range(200) for b in range(a + 1, 200) if a % 25 == b % 25
    }
    assert got == expected


def test_hot_band_salting_keeps_recall(spark):
    """Force the common-segment bands hot (cap below the class size) and
    check the salted-triangle disposition still covers every pair —
    the scale property that motivates this tier."""
    docs = _corpus(spark, 100)
    cfg = PipelineConfig(minhash_k=128, lsh_bands=64, lsh_rows=2,
                         hot_band_threshold=2, band_cap=10_000)
    out, metrics = audio_set_minhash_pairs(
        docs, "doc_id", "bytes", "sr_hz", threshold=0.3, cfg=cfg,
        return_metrics=True, **_LM_KW
    )
    got = {(r.id1, r.id2) for r in out.collect()}
    expected = {(a, b) for a in range(100) for b in range(a + 1, 100)
                if a % 25 == b % 25}
    assert got == expected
    disp = {r.disposition for r in metrics.collect()}
    assert "salted" in disp  # the hot path actually exercised


def test_short_payloads_excluded(spark):
    docs = _corpus(spark, 75).withColumn(
        "bytes",
        F.when(F.col("doc_id") < 5, F.lit(b"\x00\x00")).otherwise(F.col("bytes")),
    )
    out = audio_set_minhash_pairs(
        docs, "doc_id", "bytes", "sr_hz", threshold=0.3, **_LM_KW
    )
    ids = {r.id1 for r in out.collect()} | {r.id2 for r in out.collect()}
    assert ids and all(i >= 5 for i in ids)
