"""Audio quality filter: integer-channel metrics over PCM payloads and the
planted-defect fixture behind q48 (clipped / half-silent / clean regimes)."""
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.audio import (
    CLIP_LEVEL,
    SILENCE_LEVEL,
    audio_quality_udf,
    synth_quality_pcm_udf,
)


def test_quality_metrics_on_handmade_payload(spark):
    # 6 samples: 2 clipped (+/- full scale), 2 silent (0 and 327), 2 plain
    s = np.array([32767, -32767, 0, 327, 1000, -20000], dtype="<i2")
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "bytes": [s.tobytes()]})
    )
    row = (
        df.select(audio_quality_udf(F.col("bytes")).alias("q"))
        .select("q.*")
        .collect()[0]
    )
    assert (row.n_samples, row.n_clipped, row.n_silent, row.peak) == (
        6, 2, 2, CLIP_LEVEL,
    )
    assert SILENCE_LEVEL == 328  # the 327 sample above sits just under it


def test_quality_metrics_empty_and_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "bytes": [b"", None]})
    )
    rows = (
        df.select("id", audio_quality_udf(F.col("bytes")).alias("q"))
        .select("id", "q.*")
        .orderBy("id")
        .collect()
    )
    for r in rows:
        assert (r.n_samples, r.n_clipped, r.n_silent, r.peak) == (0, 0, 0, 0)


def test_planted_regimes_separate(spark):
    # ids hitting each regime: 3 (%7==3 clipped), 4 (%11==4 half-silent),
    # 12 (clean: 12%7=5, 12%11=1), 59 (59%7==3 AND 59%11==4: both at once)
    ids = [3, 4, 12, 59]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    m = (
        df.select(
            "doc_id",
            audio_quality_udf(synth_quality_pcm_udf(F.col("doc_id"))).alias("q"),
        )
        .select("doc_id", "q.*")
        .orderBy("doc_id")
        .collect()
    )
    by_id = {r.doc_id: r for r in m}
    assert by_id[3].n_clipped > 100 and by_id[3].peak == CLIP_LEVEL
    assert by_id[4].n_silent >= 400 and by_id[4].n_clipped == 0
    assert by_id[12].n_clipped == 0 and by_id[12].n_silent < 40
    assert by_id[12].peak < CLIP_LEVEL
    # double-defect id keeps both signatures (clipping only in the unsilenced half)
    assert by_id[59].n_silent >= 400 and by_id[59].n_clipped > 50
    for r in m:
        assert r.n_samples == 800


def test_zcr_and_peak_udfs(spark):
    import numpy as np

    from text_similarity_node_spark.operators.audio import (
        peak_abs_udf,
        zcr_count_udf,
    )

    # hand-built int16 streams: zeros are dropped before pairing, so a
    # crossing that passes THROUGH a zero sample counts once —
    # [1,-1,0,-2,3] -> [1,-1,-2,3]: crossings (1,-1),(-2,3); [2,0,-2] -> 1
    hand = np.array([1, -1, 0, -2, 3], dtype="<i2").tobytes()
    through_zero = np.array([2, 0, -2], dtype="<i2").tobytes()
    # analytic check: a k-cycle sine over n samples crosses zero ~2k times
    # (300 Hz lands exact zeros every 80 samples — the case the
    # drop-zeros rule exists for)
    t = np.arange(800) / 16000.0
    sine = (np.sin(2 * np.pi * 300.0 * t) * 16384.0).astype("<i2").tobytes()
    df = spark.createDataFrame(
        pd.DataFrame({"i": [0, 1, 2], "b": [hand, through_zero, sine]})
    ).select(
        "i",
        zcr_count_udf(F.col("b")).alias("z"),
        peak_abs_udf(F.col("b")).alias("p"),
    )
    rows = {r.i: r for r in df.collect()}
    assert rows[0].z == 2 and rows[0].p == 3
    assert rows[1].z == 1 and rows[1].p == 2
    # 15 cycles -> 29-30 crossings
    assert 28 <= rows[2].z <= 30
    assert 16000 <= rows[2].p <= 16384
