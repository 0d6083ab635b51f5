"""Append-mode watermarked streaming rollup: emitted == finalized batch
windows; late events are dropped; pending windows flush when the watermark
advances."""

from __future__ import annotations

import datetime
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


def _read_out(spark, path):
    return {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(path).collect()
    }


def test_streaming_rollup_append_mode(spark, dirs):
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
    got = _read_out(spark, dirs["out"])

    batch = windowed_event_counts(events).collect()
    max_ts = events.agg(F.max(F.col("ts").cast("timestamp"))).first()[0]
    wm = max_ts - datetime.timedelta(minutes=10)
    finalized = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch
        if r.window_end <= wm
    }
    pending = {k for r in batch if r.window_end > wm
               for k in [(r.window_start, r.event_type)]}
    # append mode emits exactly the finalized windows, with batch values
    assert got == finalized
    assert len(finalized) > 0
    # the trailing (pending) windows are NOT emitted yet — that's the
    # honest price of real watermark semantics in a drain-style run
    assert pending and all(k not in got for k in pending)


def test_late_event_is_dropped_and_pending_windows_flush(spark, dirs):
    """Continues the previous drain's checkpoint: one event far older than
    the watermark must not change any emitted window, while a new fresh
    event advances the watermark and flushes the previously-pending
    windows."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", "event_type", "value"
    )
    before = _read_out(spark, dirs["out"])
    min_ts, max_ts = events.agg(
        F.min(F.col("ts").cast("timestamp")), F.max(F.col("ts").cast("timestamp"))
    ).first()
    late = [(min_ts + datetime.timedelta(minutes=30), "late_type", 1.0)]
    fresh = [(max_ts + datetime.timedelta(hours=3), "fresh_type", 2.0)]
    spark.createDataFrame(late + fresh, events.schema).write.mode("append").parquet(
        dirs["src"]
    )
    run_available_now(
        spark, dirs["src"], events.schema, dirs["out"], dirs["ck"]
    )
    after = _read_out(spark, dirs["out"])
    # the late event's window was finalized long ago: dropped, not re-emitted
    assert not any(k[1] == "late_type" for k in after)
    # previously emitted windows unchanged
    assert all(after[k] == v for k, v in before.items())
    # the fresh event advanced the watermark past the old trailing windows:
    # they are now appended, and match the batch rollup
    batch_all = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(events).collect()
    }
    newly = {k: v for k, v in after.items() if k not in before}
    assert newly
    for k, v in newly.items():
        if k[1] not in ("late_type", "fresh_type"):
            assert batch_all[k] == v


def test_watermark_present_in_streaming_plan(spark, dirs):
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(dirs["src"])
    agg = windowed_event_counts(stream, watermark_delay="42 minutes")
    assert agg.isStreaming
    plan = agg._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan or "watermark" in plan.lower()


def test_replayed_batch_writes_once(spark, tmp_path):
    """A foreachBatch replay (crash between parquet write and checkpoint
    commit) must not double-append its windows: same batch_id -> same
    subdirectory, overwritten."""
    from text_similarity_node_spark.streaming.windowed import write_batch_idempotent

    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00", "click", 3, 1.5)],
        "window_start string, window_end string, event_type string, "
        "n_events long, sum_value double",
    )
    write_batch_idempotent(df, out, 7)
    write_batch_idempotent(df, out, 7)  # replay
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    write_batch_idempotent(df, out, 8)  # a genuinely new batch
    assert spark.read.parquet(out).count() == 2
