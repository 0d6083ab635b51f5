"""Energy VAD and stereo downmix operators: handmade-payload semantics,
null/short-payload contracts, and the planted-structure fixtures behind
q53 (lead/tail silent frames) and q55 (interleaved L/R channels)."""
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio import (
    SILENCE_LEVEL,
    downmix_stats_udf,
    synth_stereo_pcm_udf,
    synth_vad_pcm_udf,
    vad_udf,
)


def test_vad_handmade_frames(spark):
    # 4 frames of 4 samples, threshold = 4 * SILENCE_LEVEL = 1312:
    # frame 0 silent, frame 1 loud, frame 2 silent, frame 3 loud
    s = np.array(
        [0, 0, 300, -300,          # sum 600  -> silent
         5000, 0, 0, 0,            # sum 5000 -> active
         1, -1, 1, -1,             # sum 4    -> silent
         0, -2000, 0, 0],          # sum 2000 -> active
        dtype="<i2",
    )
    df = spark.createDataFrame(pd.DataFrame({"bytes": [s.tobytes()]}))
    r = (
        df.select(vad_udf(frame_len=4)(F.col("bytes")).alias("v"))
        .select("v.*")
        .collect()[0]
    )
    assert (r.n_frames, r.n_active, r.first_active, r.last_active) == (
        4, 2, 1, 3,
    )


def test_vad_all_silent_and_degenerate(spark):
    silent = np.zeros(320, dtype="<i2").tobytes()
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "bytes": [silent, b"\x00\x01", None]})
    )
    rows = (
        df.select("id", vad_udf()(F.col("bytes")).alias("v"))
        .select("id", "v.*")
        .orderBy("id")
        .collect()
    )
    assert (rows[0].n_frames, rows[0].n_active) == (2, 0)
    assert (rows[0].first_active, rows[0].last_active) == (-1, -1)
    for r in rows[1:]:  # shorter than one frame / null -> empty contract
        assert (r.n_frames, r.n_active, r.first_active, r.last_active) == (
            0, 0, -1, -1,
        )


def test_vad_planted_structure_matches_ids(spark):
    # synth plants lead = id % 4 and tail = id % 3 silent frames out of 10
    ids = [0, 5, 7, 11]  # (lead, tail) = (0,0), (1,2), (3,1), (3,2)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    rows = (
        df.select(
            "doc_id",
            vad_udf()(synth_vad_pcm_udf(F.col("doc_id"))).alias("v"),
        )
        .select("doc_id", "v.*")
        .orderBy("doc_id")
        .collect()
    )
    for r in rows:
        lead, tail = r.doc_id % 4, r.doc_id % 3
        assert r.n_frames == 10
        assert r.first_active == lead
        assert r.last_active == 9 - tail
        assert r.n_active == 10 - lead - tail
    assert SILENCE_LEVEL * 160 == 52480  # the q53 oracle's literal


def test_downmix_handmade_stereo(spark):
    # 3 frames: L = [100, -101, 32000], R = [200, -100, 32000]
    # mono = trunc((L+R)/2) = [150, -100 (toward zero), 32000]
    inter = np.array([100, 200, -101, -100, 32000, 32000], dtype="<i2")
    df = spark.createDataFrame(pd.DataFrame({"bytes": [inter.tobytes()]}))
    r = (
        df.select(downmix_stats_udf(F.col("bytes")).alias("m"))
        .select("m.*")
        .collect()[0]
    )
    mono = [150, -100, 32000]
    assert r.n_frames == 3
    assert r.peak == 32000
    assert r.sum_abs == sum(abs(m) for m in mono)
    assert r.checksum == sum((i + 1) * m for i, m in enumerate(mono))


def test_downmix_identical_channels_is_identity(spark):
    # when L == R the downmix must reproduce the channel exactly
    chan = np.array([7, -7, 123, -32767, 0], dtype="<i2")
    inter = np.repeat(chan, 2).astype("<i2")
    df = spark.createDataFrame(pd.DataFrame({"bytes": [inter.tobytes()]}))
    r = (
        df.select(downmix_stats_udf(F.col("bytes")).alias("m"))
        .select("m.*")
        .collect()[0]
    )
    c = chan.astype(np.int64)
    assert r.n_frames == len(c)
    assert r.peak == int(np.abs(c).max())
    assert r.sum_abs == int(np.abs(c).sum())
    assert r.checksum == int((np.arange(1, len(c) + 1) * c).sum())


def test_synth_stereo_channels_differ(spark):
    # the fixture's L and R frequencies differ for every id mod lcm(300,250)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 42]}))
    payloads = (
        df.select(synth_stereo_pcm_udf(F.col("doc_id")).alias("b"))
        .collect()
    )
    for row in payloads:
        x = np.frombuffer(row.b, dtype="<i2")
        assert len(x) == 800
        assert not np.array_equal(x[0::2], x[1::2])


def test_normalize_gain_semantics(spark):
    from text_similarity_node_spark.operators.audio import normalize_gain_udf

    # clip A: peak 15000 -> gain 2.0x exactly; negative samples must
    # trunc toward zero ((-7500*2e6)//1e6 = -15000, not floor drift)
    a = np.array([15000, -7500, 1], dtype="<i2")
    # clip B: peak 5000 -> uncapped gain would be 6x; cap at 4x applies
    b = np.array([5000, -5000], dtype="<i2")
    # clip C: all zeros -> zero gain, zero outputs (no div-by-zero)
    c = np.zeros(4, dtype="<i2")
    df = spark.createDataFrame(
        pd.DataFrame(
            {"id": [1, 2, 3], "bytes": [a.tobytes(), b.tobytes(), c.tobytes()]}
        )
    )
    rows = (
        df.select("id", normalize_gain_udf()(F.col("bytes")).alias("g"))
        .select("id", "g.*")
        .orderBy("id")
        .collect()
    )
    ra, rb, rc = rows
    assert (ra.peak_in, ra.gain_micro, ra.peak_out) == (15000, 2_000_000, 30000)
    assert ra.checksum_out == 1 * 30000 + 2 * (-15000) + 3 * 2
    assert (rb.peak_in, rb.gain_micro, rb.peak_out) == (5000, 4_000_000, 20000)
    assert rb.checksum_out == 1 * 20000 + 2 * (-20000)
    assert (rc.peak_in, rc.gain_micro, rc.peak_out, rc.checksum_out) == (
        0, 0, 0, 0,
    )


def test_downmix_pcm_dual_mono_roundtrip(spark):
    """mono -> dual-mono stereo -> downmix reproduces the source bytes
    exactly (the q117 normalization contract), and a genuinely panned
    stereo payload downmixes to trunc((L+R)/2)."""
    import numpy as np
    from pyspark.sql import functions as F

    from text_similarity_node_spark.operators.audio import (
        downmix_pcm_udf,
        mono_to_stereo_pcm_udf,
        synth_sine1s_pcm_udf,
    )

    df = (
        spark.range(4).select(F.col("id").alias("doc_id"))
        .withColumn("mono", synth_sine1s_pcm_udf()(F.col("doc_id")))
        .withColumn("stereo", mono_to_stereo_pcm_udf(F.col("mono")))
        .withColumn("back", downmix_pcm_udf(F.col("stereo")))
    )
    for r in df.collect():
        assert r.back == r.mono
        assert len(r.stereo) == 2 * len(r.mono)

    # panned case: L = x, R = 0 -> trunc(x/2)
    x = np.array([100, -101, 32767, -32768], dtype="<i2")
    st = np.zeros(8, dtype="<i2")
    st[0::2] = x
    pan = spark.createDataFrame([(bytes(st.tobytes()),)], "b binary")
    out = pan.select(downmix_pcm_udf("b").alias("m")).collect()[0].m
    got = np.frombuffer(out, dtype="<i2").tolist()
    assert got == [50, -50, 16383, -16384]  # trunc toward zero
