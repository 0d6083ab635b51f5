"""Cross-modal edge DIFF (operators/dedup.crossmodal_disagreement): the
three-verdict contract behind q102 — full_dup / transcript_conflict /
re_read — recovered from waveforms + strings alone on a planted fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio import synth_sine1s_pcm_udf
from text_similarity_node_spark.operators.dedup import crossmodal_disagreement

FP_KW = dict(
    min_matches=2, frame_len=4096, hop=2048, peaks_per_frame=1,
    fanout=2, freq_quant_hz=1.0,
)


def _corpus(spark):
    # 4 clips: 1=base(class 7, "alpha beta"), 2=same recording re-jittered
    # with a different transcript, 3=new recording (class 9) with base's
    # exact transcript, 4=same recording + same transcript as base.
    rows = [
        (1, 7, "alpha beta"),
        (2, 1_000_000 + 7, "alpha GAMMA"),
        (3, 9, "alpha beta"),
        (4, 1_000_000 + 7 + 400, "alpha beta"),
    ]
    df = spark.createDataFrame(rows, "clip_id long, synth_key long, transcript string")
    return (
        df.withColumn("bytes", synth_sine1s_pcm_udf()(F.col("synth_key")))
        .withColumn("sr_hz", F.lit(16000))
        .drop("synth_key")
    )


def test_three_verdicts_from_content_alone(spark):
    out = {
        (r.id1, r.id2): (r.audio_dup, r.text_dup, r.verdict)
        for r in crossmodal_disagreement(_corpus(spark), **FP_KW).collect()
    }
    assert out[(1, 2)] == (True, False, "transcript_conflict")
    assert out[(1, 3)] == (False, True, "re_read")
    assert out[(1, 4)] == (True, True, "full_dup")
    assert out[(2, 4)] == (True, False, "transcript_conflict")
    assert out[(3, 4)] == (False, True, "re_read")
    # 2 vs 3: different recording AND different words -> no row at all
    assert (2, 3) not in out and len(out) == 5
