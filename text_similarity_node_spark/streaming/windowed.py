"""Watermarked windowed aggregation over an event stream.

The engine's Structured Streaming surface beyond the foreachBatch dedup
(incremental.py): a classic event-time rollup with late-data handling —
``readStream`` source -> event-time window + watermark -> stateful
aggregation, drained in **append mode**: a window's row is emitted exactly
once, when the watermark (max observed event time − delay) passes the
window end; its state is then evicted, and events arriving after the
watermark are dropped.  Those semantics only exist in append/update mode —
in complete mode Spark neither evicts window state nor drops late data, so
the watermark would be inert (the reason this runner is append-mode).

The price of real watermark semantics is that the trailing windows — those
the watermark hasn't passed yet — stay PENDING in state at the end of an
``availableNow`` drain; they are emitted by a later run over the same
checkpoint once newer events advance the watermark.  The correctness
contract (tests/test_streaming_windowed.py) is therefore: emitted windows
== the batch rollup restricted to finalized windows, late events do not
change already-emitted windows, and the trailing windows appear after the
watermark advances.

Scale notes: state is partitioned by (window, group key) — the same shuffle
key a batch rollup would use; append-mode eviction bounds state to the
windows inside the watermark horizon, so the query runs indefinitely.
This is the streaming twin of the batch q11 events rollup in
__spark_entry__.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """events stream (ts, event_type, value, ...) -> per-(window, key)
    counts and sums with a watermark.  Works on both streaming and batch
    DataFrames (watermark is a no-op in batch mode), so the same code path
    serves the rollup and its own correctness oracle."""
    # watermarks require TIMESTAMP (with zone); parquet sources often carry
    # TIMESTAMP_NTZ — cast on both paths so window bounds agree
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def write_batch_idempotent(batch_df: DataFrame, output_dir: str, batch_id: int) -> None:
    """batch_id-keyed subdirectory + overwrite: a batch replayed after a
    crash between the write and the checkpoint commit lands in the same
    directory and overwrites itself instead of double-appending its
    finalized windows (same idempotence pattern as incremental.py's pairs
    store).  Readers see batch_id as a discovered partition column."""
    batch_df.write.mode("overwrite").parquet(
        os.path.join(output_dir, f"batch_id={int(batch_id)}")
    )


def run_available_now(
    spark,
    source_dir: str,
    schema,
    output_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """Drain a parquet-directory stream with trigger=availableNow into a
    parquet sink, append mode: each finalized window is appended exactly
    once (checkpointed watermark + batch ids make re-runs incremental and
    idempotent).  Windows the watermark hasn't closed remain in state and
    are appended by a later invocation with the same checkpoint once newer
    events arrive."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_counts(stream, **kwargs)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(batch_df, output_dir, batch_id)

    (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
