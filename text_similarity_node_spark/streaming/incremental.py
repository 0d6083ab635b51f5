"""Incremental (streaming) near-duplicate detection.

The reference is batch-only (SURVEY.md §2.3: no watermarks/state anywhere in
its src/), so streaming here is *engine capability*, not parity: new clips
arrive as files in a directory (stand-in for Kafka at scale), and each
micro-batch is deduplicated against everything seen so far:

    new batch ─► signatures ─► bands ─┐
                                      ├─ band join ─► candidates ─► verify
    band store (all history) ─────────┘                   │
    docs store (gram arrays) ─────────────────────────────┘

State lives in the checkpoint warehouse as two append-only parquet stores —
the streaming analogue of the batch pipeline's checkpoint tables, giving
exactly-once semantics through foreachBatch + idempotent batch-id dirs.

Why batch cost does NOT grow linearly with history:

* The new-vs-history band join broadcasts the NEW side (a micro-batch's
  bands are small by definition), so the history store is streamed through
  a broadcast-hash join — never shuffled.  History partitions are read in
  parallel and the per-batch shuffle volume is O(batch + candidates),
  independent of history size.
* The band store is hash-partitioned on ``pmod(band_hash, P)`` and sorted
  by ``band_hash`` within files, so the scan is sequential 16-byte rows
  with row-group min/max stats available to future range/bloom pushdowns
  (and partition-level parallelism for the broadcast probe).
* The docs store (the heavy side: per-doc sorted gram-hash arrays) is
  never scanned wholesale: only the clip_ids appearing in this batch's
  candidate pairs are fetched, via an ``isin`` predicate pushed into the
  parquet scan (files are sorted by clip_id, so row-group stats skip
  non-matching groups).  Its read cost is O(candidates), not O(history).
* Verification is the batch path's array-merge shape
  (operators/verify.verify_pairs_multiset_jaccard_arrays): per-pair numpy
  merge over presorted xxhash64 gram arrays — NOT the interpreted
  map_zip_with expression, which the batch pipeline measured ~100x slower
  (operators/verify.py header).

tests/test_streaming.py asserts pair-level correctness vs the batch
pipeline AND that per-batch wall time stays flat as history grows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators import minhash
from ..operators.verify import verify_pairs_multiset_jaccard_arrays
from ..plans.pipeline import _tokens_col

# number of hash partitions for the band store; at cluster scale make this
# proportional to history volume (it only affects file layout, not results)
_BAND_PARTITIONS = 16
# above this many candidate ids, skip the isin pushdown (a huge IN list
# costs more to evaluate than it saves) and fall back to a shuffle join
_ISIN_PUSHDOWN_CAP = 100_000


class IncrementalDedup:
    """foreachBatch sink: maintains band + gram stores and emits verified
    pairs."""

    def __init__(self, spark: SparkSession, cfg: PipelineConfig, state_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self.bands_path = os.path.join(state_dir, "bands_store")
        self.docs_path = os.path.join(state_dir, "docs_store")
        self.pairs_path = os.path.join(state_dir, "verified_pairs")
        self.labels_path = os.path.join(state_dir, "cluster_labels")

    def _store_exists(self, path: str) -> bool:
        return os.path.exists(path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        import time

        from .ledger import append_batch_metrics

        t0 = time.time()
        cfg = self.cfg
        docs = batch_df.select("clip_id", "transcript").withColumn(
            "tokens", _tokens_col(cfg)
        )
        sig = minhash.with_minhash(docs, "tokens", cfg).select("clip_id", "minhash")
        new_bands = minhash.explode_bands(sig, "clip_id", "minhash", cfg).cache()
        # per-doc sorted gram-hash arrays + totals: the array-merge verify's
        # input shape, precomputed once per doc at ingest time
        new_docs = docs.select(
            "clip_id",
            F.sort_array(
                F.transform(F.col("tokens"), lambda t: F.xxhash64(t))
            ).alias("gram_hashes"),
            F.size("tokens").alias("n_grams"),
        ).cache()

        # candidates: new-vs-new plus new-vs-history.  Both joins broadcast
        # the new side, so history is streamed, never shuffled.
        a, b = new_bands.alias("a"), new_bands.alias("b")
        nn = a.join(
            F.broadcast(b),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.clip_id") < F.col("b.clip_id")),
        ).select(
            F.col("a.clip_id").alias("id1"), F.col("b.clip_id").alias("id2")
        )
        if self._store_exists(self.bands_path):
            hist = self.spark.read.parquet(self.bands_path).alias("h")
            nh = hist.join(
                F.broadcast(new_bands.alias("n")),
                (F.col("n.band_id") == F.col("h.band_id"))
                & (F.col("n.band_hash") == F.col("h.band_hash")),
            ).select(
                F.least(F.col("n.clip_id"), F.col("h.clip_id")).alias("id1"),
                F.greatest(F.col("n.clip_id"), F.col("h.clip_id")).alias("id2"),
            ).filter(F.col("id1") != F.col("id2"))
            cand = nn.unionByName(nh)
        else:
            cand = nn
        cand = cand.dropDuplicates(["id1", "id2"]).cache()

        # gram arrays for exactly the docs the candidates touch: new-batch
        # docs from memory; historical docs via a pushed-down isin scan
        # (store files are sorted by clip_id -> row-group skipping), so the
        # docs-store read is O(candidates), not O(history).  The id set is
        # counted distributively FIRST and only collected to the driver when
        # it fits under _ISIN_PUSHDOWN_CAP — a hot-band batch against deep
        # history can produce millions of candidate ids, and those take the
        # left-semi join path without ever touching the driver.
        cand_ids_df = (
            cand.select(F.explode(F.array("id1", "id2")).alias("clip_id"))
            .distinct()
            .cache()
        )
        n_cand_ids = cand_ids_df.count()
        stores = [new_docs]
        if self._store_exists(self.docs_path) and n_cand_ids:
            hist_docs = self.spark.read.parquet(self.docs_path)
            if n_cand_ids <= _ISIN_PUSHDOWN_CAP:
                cand_ids = [r[0] for r in cand_ids_df.collect()]
                hist_docs = hist_docs.filter(F.col("clip_id").isin(*cand_ids))
            else:
                hist_docs = hist_docs.join(cand_ids_df, "clip_id", "left_semi")
            stores.append(hist_docs)
        all_docs = stores[0] if len(stores) == 1 else stores[0].unionByName(stores[1])
        # dedupe (a replayed batch may have written its docs already)
        all_docs = all_docs.dropDuplicates(["clip_id"])

        verified = verify_pairs_multiset_jaccard_arrays(
            cand,
            all_docs.select(
                "clip_id",
                F.col("gram_hashes").alias("tokens_presorted"),
                F.col("n_grams"),
            ),
            "clip_id",
            "tokens_presorted",
            cfg.verify_threshold,
            presorted_hashes=True,
            total_col="n_grams",
        ).select(
            "id1", "id2", "jaccard", F.lit(int(batch_id)).alias("batch_id")
        )
        # idempotence: one output dir per batch id, overwritten on replay
        verified.write.mode("overwrite").parquet(
            os.path.join(self.pairs_path, f"batch_id={int(batch_id)}")
        )
        self._update_labels(batch_id)
        (
            new_bands.withColumn(
                "bh_part", F.pmod(F.col("band_hash"), F.lit(_BAND_PARTITIONS))
            )
            .sortWithinPartitions("band_hash")
            .write.mode("append")
            .partitionBy("bh_part")
            .parquet(self.bands_path)
        )
        new_docs.sortWithinPartitions("clip_id").write.mode("append").parquet(
            self.docs_path
        )
        # per-batch metrics row (batch-id-keyed file: replay overwrites);
        # counts come from cached frames / the just-written tiny pair dir
        append_batch_metrics(
            self.state_dir, "text", batch_id,
            rows_in=new_docs.count(),
            n_candidates=cand.count(),
            n_pairs=self.spark.read.parquet(
                os.path.join(self.pairs_path, f"batch_id={int(batch_id)}")
            ).count(),
            started_at=t0,
        )
        new_bands.unpersist()
        new_docs.unpersist()
        cand.unpersist()
        cand_ids_df.unpersist()

    def compact_stores(self, target_files_per_partition: int = 1) -> None:
        """Rewrite the band and doc stores to bounded file counts: each
        micro-batch appends its own small parquet files, and after many
        batches the footer-read overhead (one per file per scan) starts to
        dominate the history probe.  Compaction preserves layout
        invariants — bands stay hash-partitioned on bh_part and sorted by
        band_hash, docs stay sorted by clip_id (the row-group-skipping
        contract of the isin pushdown).  Run it between drains (it must
        not race an active process_batch); atomic via write-new + rename,
        same as the catalog's checkpoint writes."""
        import shutil
        import uuid

        spark = self.spark
        for path, part_cols, sort_col in (
            (self.bands_path, ["bh_part"], "band_hash"),
            (self.docs_path, [], "clip_id"),
        ):
            if not self._store_exists(path):
                continue
            df = spark.read.parquet(path)
            tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
            writer = (
                df.repartition(target_files_per_partition, *part_cols)
                if part_cols
                else df.coalesce(target_files_per_partition)
            ).sortWithinPartitions(sort_col).write.mode("overwrite")
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            writer.parquet(tmp)
            old = f"{path}__old_{uuid.uuid4().hex[:8]}"
            os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old, ignore_errors=True)

    def start(self, source_dir: str, schema: str, checkpoint_dir: str):
        stream = (
            self.spark.readStream.schema(schema).parquet(source_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def verified_pairs(self) -> DataFrame:
        return self.spark.read.parquet(self.pairs_path)

    # --- incremental cluster-label maintenance ---------------------------
    # (shared machinery + scale/replay rationale: streaming/labels.py)

    def _update_labels(self, batch_id: int) -> None:
        from .labels import update_labels

        update_labels(self.spark, self.pairs_path, self.labels_path, batch_id)

    def cluster_labels(self) -> DataFrame:
        from .labels import current_labels

        return current_labels(self.spark, self.labels_path)
