"""interval_join edge semantics: [lo, hi) boundary inclusivity across
bucket boundaries, key isolation, and the loud width-contract failure."""
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.rangejoin import interval_join


def test_interval_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 150), (3, 10, 199), (4, 10, 200), (5, 11, 150)],
        ["event_id", "k", "v"],
    )
    right = spark.createDataFrame(
        [(7, 10, 100, 200), (8, 11, 0, 100)],
        ["rid", "k", "lo", "hi"],
    )
    out = sorted(
        (r.event_id, r.rid)
        for r in interval_join(
            left, right, "v", "lo", "hi", max_width=100, keys=["k"]
        ).collect()
    )
    # lo inclusive (1), interior (2, 3), hi EXCLUSIVE (4 out), wrong key /
    # out of range (5 out)
    assert out == [(1, 7), (2, 7), (3, 7)]


def test_interval_join_width_contract_raises(spark):
    left = spark.createDataFrame([(1, 50)], ["event_id", "v"])
    right = spark.createDataFrame([(7, 0, 500)], ["rid", "lo", "hi"])
    with pytest.raises(Exception, match="wider than max_width"):
        interval_join(left, right, "v", "lo", "hi", max_width=100).collect()
