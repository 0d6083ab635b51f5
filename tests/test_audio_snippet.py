"""Query-by-snippet retrieval (offset-histogram voting): recover WHICH
catalog clip contains each planted snippet and the exact frame offset,
from the waveforms alone — plus the negative case (snippet with no
parent in the catalog) and the metered hot-hash cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio import synth_track_pcm_udf
from text_similarity_node_spark.operators.audio_fp import snippet_containment

FP_KW = dict(
    frame_len=4096, hop=2048, peaks_per_frame=1, fanout=2, freq_quant_hz=1.0
)


def _corpus(spark, track_ids, snippet_parents):
    synth = synth_track_pcm_udf()
    tracks = spark.createDataFrame(
        [(int(i),) for i in track_ids], "clip_id long"
    )
    snips = spark.createDataFrame(
        [(int(p) + 1_000_000,) for p in snippet_parents], "clip_id long"
    )

    def mat(df):
        return df.withColumn("bytes", synth(F.col("clip_id"))).withColumn(
            "sr_hz", F.lit(16000)
        )

    return mat(tracks), mat(snips)


def test_snippet_offset_recovery_exact(spark):
    parents = list(range(0, 24, 4))  # 0,4,8,12,16,20 -> offsets 0,4,2,0,4,2
    tracks, snips = _corpus(spark, range(24), parents)
    got = {
        (r.snippet_id, r.clip_id, r.offset_frames)
        for r in snippet_containment(
            snips, tracks, min_votes=4, **FP_KW
        ).collect()
    }
    # planted truth: parent c, segment offset c % 6, 4 frames per segment
    want = {(p + 1_000_000, p, 4 * (p % 6)) for p in parents}
    assert got == want


def test_snippet_without_parent_returns_nothing(spark):
    # catalog excludes track 8; its snippet shares no frequency with any
    # other track (globally unique per (track, segment)), so it must not
    # match anything — precision, not just recall
    tracks, snips = _corpus(spark, [c for c in range(24) if c != 8], [8, 12])
    rows = snippet_containment(snips, tracks, min_votes=4, **FP_KW).collect()
    assert {r.snippet_id for r in rows} == {1_000_012}


def test_hot_hash_cap_is_metered_not_silent(spark):
    # catalog of IDENTICAL waveforms (same id synthesized repeatedly is
    # impossible — ids are the frequency key — so replicate track 0's
    # payload under many ids): every landmark hash is shared by all 9
    # clips, the cap drops them all, and the drop table says so
    synth = synth_track_pcm_udf()
    one = (
        spark.createDataFrame([(0,)], "clip_id long")
        .withColumn("bytes", synth(F.col("clip_id")))
        .collect()[0]
        .bytes
    )
    cat = spark.createDataFrame(
        [(int(i), bytearray(one), 16000) for i in range(9)],
        "clip_id long, bytes binary, sr_hz int",
    )
    _, snips = _corpus(spark, [], [0])
    best, hot = snippet_containment(
        snips, cat, min_votes=4, hash_cap=8, return_metrics=True, **FP_KW
    )
    assert best.count() == 0
    dropped = hot.collect()
    assert dropped and all(r.n_docs == 9 for r in dropped)
    # raising the cap re-admits the hashes; the snippet then resolves to
    # the tie-broken smallest clip_id at its true offset
    best2 = snippet_containment(
        snips, cat, min_votes=4, hash_cap=16, **FP_KW
    ).collect()
    assert len(best2) == 1
    assert best2[0].clip_id == 0 and best2[0].offset_frames == 0
