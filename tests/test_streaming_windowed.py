"""Watermarked windowed streaming rollup == batch rollup on the same data."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.streaming.windowed import (
    run_available_now,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def dirs():
    with tempfile.TemporaryDirectory() as d:
        yield {
            "src": os.path.join(d, "src"),
            "out": os.path.join(d, "out"),
            "ck": os.path.join(d, "ck"),
        }


def test_streaming_rollup_matches_batch(spark, dirs):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", "event_type", "value"
    )
    # two micro-batch files, as a stream source would receive them
    half1 = events.filter(F.dayofmonth("ts") % 2 == 0)
    half2 = events.filter(F.dayofmonth("ts") % 2 == 1)
    half1.write.mode("overwrite").parquet(dirs["src"])
    half2.write.mode("append").parquet(dirs["src"])

    run_available_now(
        spark, dirs["src"], events.schema, dirs["out"], dirs["ck"]
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(dirs["out"]).collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(events).collect()
    }
    assert got == want
    assert len(want) > 0


def test_watermark_present_in_streaming_plan(spark, dirs):
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(dirs["src"])
    agg = windowed_event_counts(stream, watermark_delay="42 minutes")
    assert agg.isStreaming
    plan = agg._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan or "watermark" in plan.lower()
