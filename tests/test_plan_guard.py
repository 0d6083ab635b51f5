"""assert_scalable_plan: the library-surface physical-plan gate."""

import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.plans.guard import (
    UnscalablePlanError,
    assert_scalable_plan,
    plan_stats,
)


def test_cartesian_is_fatal(spark):
    # a tiny crossJoin compiles to BroadcastNestedLoopJoin; drop the
    # broadcast threshold so the planner is forced into CartesianProduct
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cross = spark.range(10).crossJoin(spark.range(10))
        with pytest.raises(UnscalablePlanError, match="CartesianProduct"):
            assert_scalable_plan(cross)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_equi_join_passes_and_counts(spark):
    a = spark.range(1000).withColumn("k", F.col("id") % 7)
    b = spark.range(1000).withColumn("k", F.col("id") % 7)
    j = a.join(b, "k").groupBy("k").count()
    stats = assert_scalable_plan(j)
    assert stats.cartesian_products == 0
    assert stats.shuffles >= 1  # the groupBy/join exchange is real


def test_bnlj_needs_acknowledgement(spark):
    a = spark.range(1000)
    tiny = spark.range(3).withColumnRenamed("id", "t")
    j = a.join(F.broadcast(tiny), F.col("id") % 100 > F.col("t"))
    with pytest.raises(UnscalablePlanError, match="BroadcastNestedLoopJoin"):
        assert_scalable_plan(j)
    stats = assert_scalable_plan(j, allow_bnlj=True)
    assert stats.broadcast_nl_joins >= 1


def test_shuffle_budget(spark):
    df = spark.range(1000).withColumn("k", F.col("id") % 5)
    agg = df.groupBy("k").count()
    with pytest.raises(UnscalablePlanError, match="shuffles"):
        assert_scalable_plan(agg, max_shuffles=0)
    assert_scalable_plan(agg, max_shuffles=2)


def test_production_operator_is_clean(spark):
    """The engine's own prefix-filter join passes its own gate."""
    from text_similarity_node_spark.operators.simjoin import (
        prefix_filter_jaccard_join,
    )

    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a", "b", "c", "d"]), (3, ["x", "y"])],
        "rid int, tokens array<string>",
    )
    out = prefix_filter_jaccard_join(df, "rid", "tokens", 0.5)
    stats = assert_scalable_plan(out)
    assert stats.distributed_joins_only


def test_plan_stats_python_eval_detection(spark):
    @F.udf("long")
    def slow(x):
        return x + 1

    df = spark.range(10).select(slow("id").alias("y"))
    assert plan_stats(df).python_evals >= 1
    with pytest.raises(UnscalablePlanError, match="row-at-a-time"):
        assert_scalable_plan(df, allow_row_python=False)
