"""Deduplication compositions for training-data pipelines.

Thin, documented compositions of the engine's primitives into the shapes a
corpus pipeline actually calls:

* exact_dedup           — hash-groupBy on content (one shuffle on md5)
* neardup_dedup         — MinHash/LSH + exact verify + CC -> keep/drop
* embedding_neardup     — RHP-bucketed cosine near-dup over embeddings
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions import columns as C
from ..operators import lsh, minhash, verify
from ..operators.components import connected_components


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Returns df + (is_duplicate, canonical_id): one row per input, the
    lexicographically-minimal id of each identical-content group marked
    canonical.  Scale: a single shuffle on the content hash; content itself
    is never compared pairwise."""
    h = F.md5(F.col(content_col))
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    return (
        df.withColumn("canonical_id", F.first(id_col).over(w))
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))
    )


def neardup_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    cfg: PipelineConfig,
) -> DataFrame:
    """MinHash/LSH candidates -> exact multiset-Jaccard verify -> connected
    components -> per-row keep/drop (cluster minimum kept).  The in-memory
    sibling of plans/pipeline.py for callers that don't need checkpoints."""
    docs = df.select(
        F.col(id_col).alias("rid"),
        C.char_ngrams(F.col(text_col), cfg.ngram_size).alias("tokens"),
    )
    sig = minhash.with_minhash(docs, "tokens", cfg)
    bands = minhash.explode_bands(sig, "rid", "minhash", cfg)
    pairs, _ = lsh.candidate_pairs(bands, cfg, id_col="rid")
    verified = verify.verify_pairs_multiset_jaccard(
        pairs, docs, "rid", "tokens", cfg.verify_threshold
    ).select("id1", "id2")
    comp = connected_components(verified, max_iterations=cfg.cc_max_iterations)
    return (
        df.join(comp, df[id_col] == comp.clip_id, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
        .withColumn("is_duplicate", F.col(id_col) != F.col("cluster_id"))
        .drop("clip_id")
    )


def embedding_neardup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.98,
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: RHP bucket join (multiprobe) +
    exact cosine filter.  Returns (id1, id2, cos_sim)."""
    from ..operators.ann import rhp_bucket_udf

    bucket = rhp_bucket_udf(dim, n_bits, seed)
    v = df.select(
        F.col(id_col).alias("rid"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("bucket", bucket(F.col("v")))
    probes = v.withColumn(
        "pbucket",
        F.explode(
            F.array(F.col("bucket"), *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)
            ])
        ),
    )
    a = v.alias("a")
    b = probes.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.pbucket")) & (F.col("a.rid") < F.col("b.rid")),
    ).select(
        F.col("a.rid").alias("id1"),
        F.col("b.rid").alias("id2"),
        C.cosine_sim_vec(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
    ).dropDuplicates(["id1", "id2"])
    return pairs.filter(F.col("cos_sim") >= threshold)
