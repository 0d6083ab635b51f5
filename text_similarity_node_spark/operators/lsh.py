"""LSH candidate generation: salted, skew-aware band self-join.

The core scale problem (SURVEY.md §7 hard-part #2): a band key shared by m
rows yields m(m-1)/2 candidate pairs — degenerate bands (boilerplate /
silence transcripts) explode quadratically.  Strategy here:

1. count rows per (band_id, band_hash) key — one cheap aggregation;
2. keys with count > ``band_cap`` are *dropped with metrics* (never
   silently: the dropped key count and row mass go to the metrics sink) —
   at web scale such bands are boilerplate, and the SimHash + substring
   passes still cover their members;
3. keys with ``hot_band_threshold < count <= band_cap`` go through a
   **salted triangle join**: rows get a deterministic salt in [0, g); the
   pair space is covered by joining salt-block pairs (i <= j), replicating
   each row g times on the build side only — bounded fan-out, no single
   reducer sees the whole hot key;
4. cold keys take the plain equi-join (AQE handles residual skew).

Pairs are deduped on (id1 < id2) and across bands with dropDuplicates —
at most one row per candidate pair leaves this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig


def candidate_pairs(
    bands: DataFrame,
    cfg: PipelineConfig,
    id_col: str = "clip_id",
) -> tuple[DataFrame, DataFrame]:
    """bands(id, band_id, band_hash) -> (pairs(id1, id2), band_metrics).

    band_metrics rows: (band_id, band_hash, n_rows, disposition) with
    disposition in {cold, salted, dropped} — the no-silent-caps ledger."""
    key = ["band_id", "band_hash"]

    # bands is consumed by the counts aggregate and (twice) by the salted
    # self-join; the persist keeps the upstream signature decode from
    # re-running per consumer.  persist (NOT localCheckpoint: that writes
    # partitions to executor disk, and on shared-disk hardware the write
    # serializes across cores — measured 3.5x pipeline slowdown at
    # local[32]).  No unpersist leak: the ContextCleaner unpersists the
    # blocks when the plan is GC'd on the driver.
    bands = bands.persist()
    counts = bands.groupBy(*key).agg(F.count(F.lit(1)).alias("n_rows"))
    counts = counts.withColumn(
        "disposition",
        F.when(F.col("n_rows") > cfg.band_cap, F.lit("dropped"))
        .when(F.col("n_rows") > cfg.hot_band_threshold, F.lit("salted"))
        .otherwise(F.lit("cold")),
    )
    # the non-cold key set is tiny (one row per distinct hot/dropped key)
    tagged = bands.join(
        F.broadcast(counts.filter(F.col("disposition") != "cold")), key, "left"
    )
    tagged = tagged.withColumn(
        "disposition", F.coalesce("disposition", F.lit("cold"))
    ).filter(F.col("disposition") != "dropped")

    # --- one uniform salted triangle join --------------------------------
    # Cold keys take salt-bucket count 1 (salt 0 on both sides — exactly
    # the plain equi-join); hot keys take g buckets.  Left rows keep their
    # deterministic salt; right rows replicate to every block of their
    # key's bucket count.  Every unordered pair {x, y} with id_x < id_y
    # meets in exactly one block (l=x at salt_x, r=y's replica at salt_x),
    # so the pair space is covered while no reducer sees more than ~1/g of
    # a hot key's left rows — the quadratic blowup is split across g*g
    # tasks.  A single join (vs separate cold/hot branches + union) halves
    # the passes over the band table.
    g = cfg.salt_buckets
    gk = F.when(F.col("disposition") == "salted", F.lit(g)).otherwise(F.lit(1))
    left = tagged.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(id_col)), gk).cast("int")
    ).select(id_col, *key, "salt")
    right = tagged.withColumn(
        "salt_j", F.explode(F.sequence(F.lit(0), gk - 1))
    ).select(id_col, *key, "salt_j")
    l = left.alias("l")
    r = right.alias("r")
    pairs = l.join(
        r,
        (F.col("l.band_id") == F.col("r.band_id"))
        & (F.col("l.band_hash") == F.col("r.band_hash"))
        & (F.col("l.salt") == F.col("r.salt_j"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id1"), F.col(f"r.{id_col}").alias("id2")
    ).dropDuplicates(["id1", "id2"])
    return pairs, counts
