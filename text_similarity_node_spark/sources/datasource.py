"""Spark-4 Python DataSource front-end for the synthetic clips corpus.

Exposes the deterministic clips generator (sources/clips.py — FIXTURES.md §1,
input_hint schema from BASELINE.json) through the public Python DataSource
API, so the corpus is reachable the way any other table is:

    spark.dataSource.register(ClipsDataSource)
    df = (spark.read.format("tsn_clips")
          .option("n", 60000).option("seed", 42).load())

and, for the streaming sinks, as a REPLAY-DETERMINISTIC micro-batch stream
(same row at the same offset on every re-read — exactly the property the
incremental-dedup idempotence tests need from a source):

    stream = (spark.readStream.format("tsn_clips")
              .option("total_rows", 5000).option("rows_per_batch", 1000)
              .load())

Row synthesis is byte-identical to ``generate_clips`` (same plan, same RNG
streams, same PCM waveforms) — asserted in tests/test_datasource.py — so
every planted-truth contract (cluster membership, SNR >= 30 dB jitter bound,
mutation classes) carries over verbatim.

Scale notes (the 10^12-row honesty clause): the cluster plan is a
sequential-RNG scan materialized once per query on the driver —
O(n) ints, the same contract ``generate_clips`` already has — and each
InputPartition ships only its [start, end) slice (16 bytes/row), so
executor memory is bounded by partition size.  Rows are yielded as
Arrow RecordBatches in bounded chunks, never a whole partition as one
Python list.  A real 10^12-row corpus lives in Iceberg and is *read*,
not synthesized; this source exists so tests, benches, and streaming
demos have a zero-I/O corpus with known ground truth.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .clips import ClipsSpec, _base_transcript, _mutate, _pcm_wave, _plan, _rng_for

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string, true_cluster_id string"
)

_ARROW_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
        ("true_cluster_id", pa.string()),
    ]
)

_CHUNK = 256  # rows per yielded RecordBatch (bounds per-batch PCM bytes)


def _spec_from_options(options) -> ClipsSpec:
    return ClipsSpec(
        n_clips=int(options.get("n", 1000)),
        seed=int(options.get("seed", 42)),
        dup_fraction=float(options.get("dup_fraction", 0.5)),
        max_cluster_size=int(options.get("max_cluster_size", 8)),
        sr_hz=int(options.get("sr_hz", 16000)),
        dur_ms=int(options.get("dur_ms", 250)),
    )


def _synth_rows(
    spec: ClipsSpec,
    start: int,
    clusters: np.ndarray,
    ranks: np.ndarray,
) -> Iterator[pa.RecordBatch]:
    """Yield Arrow batches for indices [start, start+len(clusters)).

    Identical per-row derivation to clips.generate_clips: every field is a
    pure function of (spec, global index, cluster plan), so any sub-range
    can be synthesized independently — the property both the partitioned
    batch read and the offset-ranged stream read rely on."""
    base_cache: dict[int, str] = {}
    n = len(clusters)
    for lo in range(0, n, _CHUNK):
        hi = min(lo + _CHUNK, n)
        cols: dict[str, list] = {k.name: [] for k in _ARROW_SCHEMA}
        for off in range(lo, hi):
            idx = start + off
            cluster = int(clusters[off])
            rank = int(ranks[off])
            if cluster not in base_cache:
                base_cache[cluster] = _base_transcript(spec, cluster)
            base = base_cache[cluster]
            rng = _rng_for(spec.seed, 3, cluster, rank)
            if rank == 0:
                transcript = base
                pcm = _pcm_wave(spec, cluster)
            else:
                transcript = _mutate(base, rng, kind=int(rng.randint(0, 6)))
                pcm = _pcm_wave(spec, cluster, jitter_rng=rng)
            cols["clip_id"].append(f"clip_{idx:012d}")
            cols["bytes"].append(pcm.tobytes())
            cols["sr_hz"].append(spec.sr_hz)
            cols["dur_ms"].append(spec.dur_ms)
            cols["codec"].append("pcm_s16le")
            cols["transcript"].append(transcript)
            cols["true_cluster_id"].append(f"cluster_{cluster:09d}")
        yield pa.RecordBatch.from_pydict(cols, schema=_ARROW_SCHEMA)


class _ClipsPartition(InputPartition):
    def __init__(self, spec: ClipsSpec, start: int, clusters: bytes, ranks: bytes):
        self.spec = spec
        self.start = start
        self.clusters = clusters  # int64 LE slice of the plan, pickled compactly
        self.ranks = ranks


class _ClipsReader(DataSourceReader):
    def __init__(self, options):
        self.spec = _spec_from_options(options)
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self):
        clusters, ranks = _plan(self.spec)
        n = self.spec.n_clips
        k = max(1, min(self.num_partitions, n))
        bounds = np.linspace(0, n, k + 1).astype(np.int64)
        return [
            _ClipsPartition(
                self.spec,
                int(lo),
                clusters[lo:hi].tobytes(),
                ranks[lo:hi].tobytes(),
            )
            for lo, hi in zip(bounds[:-1], bounds[1:])
            if hi > lo
        ]

    def read(self, partition: _ClipsPartition):
        clusters = np.frombuffer(partition.clusters, dtype=np.int64)
        ranks = np.frombuffer(partition.ranks, dtype=np.int64)
        yield from _synth_rows(partition.spec, partition.start, clusters, ranks)


class _ClipsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same corpus: offset = next global index.

    ``read(start)`` emits up to ``rows_per_batch`` rows and advances the
    offset; ``readBetweenOffsets`` re-synthesizes EXACTLY the same rows for
    any replayed [start, end) range (pure function of the offsets), which is
    what makes checkpoint-recovery replays deterministic end to end."""

    def __init__(self, options):
        self.spec = _spec_from_options(options)
        self.total = int(options.get("total_rows", self.spec.n_clips))
        self.per_batch = int(options.get("rows_per_batch", 500))
        self._clusters, self._ranks = _plan(
            ClipsSpec(**{**self.spec.__dict__, "n_clips": max(self.total, 1)})
        )

    def initialOffset(self):
        return {"index": 0}

    def read(self, start: dict):
        lo = int(start["index"])
        hi = min(lo + self.per_batch, self.total)
        return self._rows(lo, hi), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["index"]), int(end["index"]))

    def _rows(self, lo: int, hi: int):
        if hi <= lo:
            return []
        batches = _synth_rows(
            self.spec, lo, self._clusters[lo:hi], self._ranks[lo:hi]
        )
        # SimpleDataSourceStreamReader prefetches on the driver and its cache
        # copy.copy()s the iterator — a generator is not copyable, so rows
        # are materialized per micro-batch (bounded by rows_per_batch).
        # Tuple rows, not Arrow: the Arrow fast path is partition-reader only.
        return [
            tuple(row)
            for b in batches
            for row in zip(*[c.to_pylist() for c in b.columns])
        ]


class ClipsDataSource(DataSource):
    """``spark.read.format("tsn_clips")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "tsn_clips"

    def schema(self) -> str:
        return CLIPS_SCHEMA

    def reader(self, schema):
        return _ClipsReader(self.options)

    def simpleStreamReader(self, schema):
        return _ClipsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ClipsDataSource)
