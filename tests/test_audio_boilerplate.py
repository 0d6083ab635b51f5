"""Corpus-frequency audio boilerplate (operators/audio_fp.
boilerplate_audio_segments): shared intro jingles are flagged by landmark
document frequency and grouped by a double-min rep fold — never a
pairwise join."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio import synth_intro_pcm_udf
from text_similarity_node_spark.operators.audio_fp import (
    boilerplate_audio_segments,
)

KW = dict(frame_len=2048, hop=1024, peaks_per_frame=1, fanout=2,
          freq_quant_hz=1.0)


def _corpus(spark, n):
    return (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .withColumn("bytes", synth_intro_pcm_udf()(F.col("doc_id")))
        .withColumn("sr_hz", F.lit(16000))
    )


def test_intro_partition_recovered(spark):
    out = {
        r.doc_id: (r.has_boilerplate, r.intro_group, r.n_boiler_hashes)
        for r in boilerplate_audio_segments(
            _corpus(spark, 200), "doc_id", "bytes", df_threshold=8, **KW
        ).collect()
    }
    # channel reps: smallest id per channel with id % 4 != 0
    reps = {}
    for d in range(200):
        if d % 4 != 0:
            reps.setdefault(d % 5, d)
    for d in range(200):
        has, grp, nb = out[d]
        if d % 4 == 0:
            assert (has, grp, nb) == (False, None, 0), d
        else:
            assert has and grp == reps[d % 5] and nb > 0, (d, out[d])


def test_df_threshold_above_channel_size_flags_nothing(spark):
    # 20 clips -> ~3 intro members per channel; threshold 10 exceeds
    # every channel's df, so no hash qualifies as boilerplate
    out = boilerplate_audio_segments(
        _corpus(spark, 20), "doc_id", "bytes", df_threshold=10, **KW
    )
    assert out.filter(F.col("has_boilerplate")).count() == 0
