"""grouped_topk: salted two-stage per-group top-k equals the naive window."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.topk import grouped_topk


def _naive(df, groups, order, k, tiebreak, descending=True):
    key = F.col(order).desc() if descending else F.col(order).asc()
    w = Window.partitionBy(*groups).orderBy(key, *[F.col(c).asc() for c in tiebreak])
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


@pytest.mark.parametrize("k,buckets", [(1, 4), (3, 4), (5, 32), (200, 8)])
def test_matches_naive_window(spark, k, buckets):
    df = (
        spark.range(2000)
        .withColumn("g", (F.col("id") % 7).cast("int"))
        .withColumn("v", F.pmod(F.xxhash64("id"), F.lit(100)).cast("int"))
    )
    got = {
        tuple(r)
        for r in grouped_topk(df, ["g"], "v", k, ["id"], salt_buckets=buckets)
        .select("g", "id", "v", "rn").collect()
    }
    want = {
        tuple(r)
        for r in _naive(df, ["g"], "v", k, ["id"]).select("g", "id", "v", "rn").collect()
    }
    assert got == want


def test_ascending_and_ties(spark):
    rows = [(1, "a", 5), (2, "a", 5), (3, "a", 5), (4, "b", 1)]
    df = spark.createDataFrame(rows, "id int, g string, v int")
    got = [
        (r.g, r.id, r.rn)
        for r in grouped_topk(df, ["g"], "v", 2, ["id"], descending=False)
        .orderBy("g", "rn").collect()
    ]
    assert got == [("a", 1, 1), ("a", 2, 2), ("b", 4, 1)]


def test_validation(spark):
    df = spark.range(3).withColumn("g", F.lit(1))
    with pytest.raises(ValueError):
        grouped_topk(df, ["g"], "id", 0, ["id"])
    with pytest.raises(ValueError):
        grouped_topk(df, ["g"], "id", 1, [])
