"""asof_join edge semantics: equal timestamps match (>= convention),
no at-or-before right row -> null payload, carry-forward picks the
LATEST at-or-before row per key."""
import datetime as dt

from pyspark.sql import functions as F

from text_similarity_node_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T05:00:00")),  # before any right row
            (2, 10, _ts("2024-01-01T10:00:00")),  # equal ts -> matches r1
            (3, 10, _ts("2024-01-01T12:30:00")),  # between r1 and r2 -> r1
            (4, 10, _ts("2024-01-02T00:00:00")),  # after r2 -> r2
            (5, 99, _ts("2024-01-01T10:00:00")),  # key with no right rows
        ],
        ["event_id", "k", "ets"],
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T10:00:00"), 100),
            (10, _ts("2024-01-01T13:00:00"), 200),
        ],
        ["k", "rts", "payload"],
    )
    out = {
        r.event_id: r.payload
        for r in asof_join(
            left, right, key="k", left_ts="ets", right_ts="rts",
            payload_cols=["payload"],
        ).collect()
    }
    assert out == {1: None, 2: 100, 3: 100, 4: 200, 5: None}
