"""Incremental (streaming) near-duplicate detection.

The reference is batch-only (SURVEY.md §2.3: no watermarks/state anywhere in
its src/), so streaming here is *engine capability*, not parity: new clips
arrive as files in a directory (stand-in for Kafka at scale), and each
micro-batch is deduplicated against everything seen so far:

    new batch ─► signatures ─► bands ─┐
                                      ├─ equi-join ─► candidates ─► verify
    signature store (all history) ────┘

State lives in the checkpoint warehouse as an append-only signature store —
the streaming analogue of the batch pipeline's checkpoint tables, giving
exactly-once semantics through foreachBatch + idempotent batch-id dirs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions import columns as C
from ..operators import minhash
from ..plans.pipeline import _tokens_col


class IncrementalDedup:
    """foreachBatch sink: maintains a band store and emits verified pairs."""

    def __init__(self, spark: SparkSession, cfg: PipelineConfig, state_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self.bands_path = os.path.join(state_dir, "bands_store")
        self.docs_path = os.path.join(state_dir, "docs_store")
        self.pairs_path = os.path.join(state_dir, "verified_pairs")

    def _store_exists(self, path: str) -> bool:
        return os.path.exists(path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        cfg = self.cfg
        docs = batch_df.select("clip_id", "transcript").withColumn(
            "tokens", _tokens_col(cfg)
        )
        sig = minhash.with_minhash(docs, "tokens", cfg).select("clip_id", "minhash")
        new_bands = minhash.explode_bands(sig, "clip_id", "minhash", cfg).cache()
        new_docs = docs.select(
            "clip_id", C.token_count_map(F.col("tokens")).alias("grams")
        ).cache()

        # candidates: new-vs-new plus new-vs-history (two joins, both on the
        # band key; the history side is the big one and stays partitioned)
        a, b = new_bands.alias("a"), new_bands.alias("b")
        nn = a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.clip_id") < F.col("b.clip_id")),
        ).select(
            F.col("a.clip_id").alias("id1"), F.col("b.clip_id").alias("id2")
        )
        if self._store_exists(self.bands_path):
            hist = self.spark.read.parquet(self.bands_path).alias("h")
            nh = new_bands.alias("n").join(
                hist,
                (F.col("n.band_id") == F.col("h.band_id"))
                & (F.col("n.band_hash") == F.col("h.band_hash")),
            ).select(
                F.least(F.col("n.clip_id"), F.col("h.clip_id")).alias("id1"),
                F.greatest(F.col("n.clip_id"), F.col("h.clip_id")).alias("id2"),
            ).filter(F.col("id1") != F.col("id2"))
            cand = nn.unionByName(nh)
        else:
            cand = nn
        cand = cand.dropDuplicates(["id1", "id2"])

        # verify with exact multiset jaccard; history grams come from the store
        if self._store_exists(self.docs_path):
            all_docs = self.spark.read.parquet(self.docs_path).unionByName(new_docs)
        else:
            all_docs = new_docs
        d1 = all_docs.select(F.col("clip_id").alias("id1"), F.col("grams").alias("g1"))
        d2 = all_docs.select(F.col("clip_id").alias("id2"), F.col("grams").alias("g2"))
        verified = (
            cand.join(d1, "id1").join(d2, "id2")
            .withColumn("jaccard", C.multiset_jaccard(F.col("g1"), F.col("g2")))
            .filter(F.col("jaccard") >= cfg.verify_threshold)
            .select("id1", "id2", "jaccard", F.lit(int(batch_id)).alias("batch_id"))
        )
        # idempotence: one output dir per batch id, overwritten on replay
        verified.write.mode("overwrite").parquet(
            os.path.join(self.pairs_path, f"batch_id={int(batch_id)}")
        )
        new_bands.write.mode("append").parquet(self.bands_path)
        new_docs.write.mode("append").parquet(self.docs_path)
        new_bands.unpersist()
        new_docs.unpersist()

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
