"""Bucketed stage outputs: the co-located-join contract, asserted at the
physical-plan level — joins and aggregations on the bucket key must not
re-shuffle the bucketed side."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.sources.catalog import ParquetCatalog


@pytest.fixture()
def catalog(spark):
    with tempfile.TemporaryDirectory(prefix="tsn_bucket_wh_") as wh:
        yield ParquetCatalog(spark, wh)
        # drop session-catalog entries so repeated fixtures don't collide
        for t in spark.catalog.listTables():
            if t.name.startswith(("sig__", "docs__")):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def _shuffle_count(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_join_skips_shuffles(spark, catalog):
    """Two stores bucketed on the same key with the same bucket count
    sort-merge-join with ZERO shuffle exchanges; the same join over plain
    parquet shuffles both sides.  Results are identical."""
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("text")
    )
    sigs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 97).alias("sig")
    )
    b_docs = catalog.write_bucketed(docs, "docs", "h1", "doc_id", n_buckets=8)
    b_sigs = catalog.write_bucketed(sigs, "sig", "h1", "doc_id", n_buckets=8)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined_b = b_docs.join(b_sigs, "doc_id")
        joined_b.collect()
        assert _shuffle_count(joined_b) == 0

        p_docs = spark.read.parquet(catalog._path("docs", "h1"))
        p_sigs = spark.read.parquet(catalog._path("sig", "h1"))
        joined_p = p_docs.join(p_sigs, "doc_id")
        joined_p.collect()
        assert _shuffle_count(joined_p) >= 2  # both sides re-shuffled

        assert sorted(map(tuple, joined_b.collect())) == sorted(
            map(tuple, joined_p.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_skips_shuffle(spark, catalog):
    """A groupBy on the bucket key over a bucketed store needs no
    exchange (partial = final aggregation within each bucket)."""
    sigs = spark.range(0, 2000).select(
        (F.col("id") % 500).alias("doc_id"), F.col("id").alias("v")
    )
    b = catalog.write_bucketed(sigs, "sig", "h2", "doc_id", n_buckets=8)
    agg = b.groupBy("doc_id").agg(F.sum("v").alias("s"))
    agg.collect()
    assert _shuffle_count(agg) == 0
    plain = (
        spark.read.parquet(catalog._path("sig", "h2"))
        .groupBy("doc_id").agg(F.sum("v").alias("s"))
    )
    plain.collect()
    # AQE's plan string can render the exchange in both the initial and
    # final sections — assert presence, not an exact count
    assert _shuffle_count(plain) >= 1
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_resume_roundtrip(spark, catalog):
    """bucketed_exists + read_bucketed give the same resume contract as
    the plain catalog: content identical after re-read, spec preserved."""
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    assert not catalog.bucketed_exists("docs", "h3")
    catalog.write_bucketed(df, "docs", "h3", "doc_id", n_buckets=4)
    assert catalog.bucketed_exists("docs", "h3")
    back = catalog.read_bucketed("docs", "h3")
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(100))


def test_pipeline_signature_store_is_bucketed(spark):
    """The pipeline persists its signature store bucketed on clip_id
    (and resumes from it); bucketed_stores=False keeps the plain path."""
    import tempfile

    from text_similarity_node_spark.config import PipelineConfig
    from text_similarity_node_spark.plans.pipeline import NearDupPipeline
    from text_similarity_node_spark.sources.clips import ClipsSpec, generate_clips

    clips, _ = generate_clips(spark, ClipsSpec(n_clips=60, seed=7))
    cfg = PipelineConfig(verify_threshold=0.8, run_id="bucketed_pipe")
    with tempfile.TemporaryDirectory(prefix="tsn_bpipe_wh_") as wh:
        pipe = NearDupPipeline(spark, cfg, wh)
        res = pipe.run(clips)
        n = res.clusters.count()
        assert n == 60
        assert pipe.catalog.bucketed_exists("signatures", cfg.config_hash())
        # resume path reads the bucketed table back
        res2 = NearDupPipeline(spark, cfg, wh).run(clips)
        assert res2.clusters.count() == n
        spark.sql(
            f"DROP TABLE IF EXISTS signatures__{cfg.config_hash()}"
        )
