"""Watermarked windowed aggregation over an event stream.

The engine's Structured Streaming surface beyond the foreachBatch dedup
(incremental.py): a classic event-time rollup with late-data handling —
``readStream`` source -> event-time window + watermark -> stateful
aggregation.  Spark manages the window state and drops events later than
the watermark; the output of an availableNow run over a static directory
equals the batch groupBy over the same data (asserted in
tests/test_streaming_windowed.py).

Scale notes: state is partitioned by (window, group key) — the same shuffle
key a batch rollup would use; watermark bounds state size so the query runs
indefinitely.  This is the streaming twin of the batch q11 events rollup in
__spark_entry__.py.
"""

from __future__ import annotations

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


def run_available_now(
    spark,
    source_dir: str,
    schema,
    output_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """Drain a parquet-directory stream with trigger=availableNow into a
    parquet sink (complete-mode aggregations need foreachBatch for file
    sinks; each batch overwrite is idempotent via the checkpoint)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_counts(stream, **kwargs)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(output_dir)

    (
        agg.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
