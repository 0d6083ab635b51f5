"""Per-batch metrics ledger for the streaming sinks.

The batch pipeline writes per-stage metrics + lineage rows to its catalog
(plans/pipeline.py); the streaming sinks get the same observability here:
one row per (micro-batch, sink) with rows-in / candidate / verified-pair
counts and wall time, written driver-side via pyarrow (a distributed write
would cost a job-submission round-trip per batch for a single row).

Idempotence matches the pair stores: the file name is keyed by batch_id,
so a replayed batch OVERWRITES its own metrics row instead of appending a
duplicate — the ledger stays one-row-per-batch under crash/replay.
"""

from __future__ import annotations

import os
import time


def append_batch_metrics(
    state_dir: str,
    sink: str,
    batch_id: int,
    rows_in: int,
    n_candidates: int,
    n_pairs: int,
    started_at: float,
) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(state_dir, "batch_metrics")
    os.makedirs(d, exist_ok=True)
    schema = pa.schema(
        [
            ("sink", pa.string()),
            ("batch_id", pa.int64()),
            ("rows_in", pa.int64()),
            ("n_candidates", pa.int64()),
            ("n_pairs", pa.int64()),
            ("elapsed_s", pa.float64()),
        ]
    )
    tbl = pa.Table.from_pylist(
        [
            {
                "sink": sink,
                "batch_id": int(batch_id),
                "rows_in": int(rows_in),
                "n_candidates": int(n_candidates),
                "n_pairs": int(n_pairs),
                "elapsed_s": float(time.time() - started_at),
            }
        ],
        schema=schema,
    )
    pq.write_table(tbl, os.path.join(d, f"metrics-{sink}-b{int(batch_id)}.parquet"))


def read_batch_metrics(spark, state_dir: str):
    return spark.read.parquet(os.path.join(state_dir, "batch_metrics"))
