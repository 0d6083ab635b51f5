"""SimHash (64-bit random-hyperplane sketch) + Hamming banding.

Maps the reference's cosine semantics (``src/algorithms/vector_based.cpp``)
to scale: documents whose token-frequency vectors have high cosine
similarity get SimHash values within a small Hamming distance.

Candidate generation uses the pigeonhole block trick: split the 64-bit
sketch into ``hamming_radius + 1`` blocks — any pair within the radius must
agree exactly on at least one block — then equi-join on (block_id,
block_value).  Verification is pure JVM: ``bit_count(s1 ^ s2) <= radius``.

The sketch itself is one Arrow-batched numpy UDF: token hash -> 64 bit
columns (unpackbits), weighted by token count, sign-reduced.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PipelineConfig
from ..functions.spark_udfs import hash_tokens_u64


@F.pandas_udf(T.LongType())
def simhash64_udf(tokens: pd.Series) -> pd.Series:
    """array<string> tokens (with multiplicity) -> 64-bit SimHash.

    Per-row numpy on purpose: the (distinct x 64) bit matrix per row is
    cache-resident.  A whole-batch lexsort + add.reduceat variant was
    measured 9x slower (DRAM-sized 2.5M x 64 int64 contrib matrix)."""
    out = np.zeros(len(tokens), dtype=np.int64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            out[i] = 0
            continue
        uniq: dict[str, int] = {}
        for t in toks:
            uniq[t] = uniq.get(t, 0) + 1
        h = hash_tokens_u64(list(uniq.keys()))
        w = np.fromiter(uniq.values(), dtype=np.int64, count=len(uniq))
        bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        acc = (w[:, None] * (2 * bits.astype(np.int64) - 1)).sum(axis=0)
        pows = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
        out[i] = pows[acc > 0].sum(dtype=np.uint64).astype(np.int64)
    return pd.Series(out)


def with_simhash(df: DataFrame, tokens_col: str, out_col: str = "simhash") -> DataFrame:
    return df.withColumn(out_col, simhash64_udf(F.col(tokens_col)))


def hamming_blocks(sim_col: Column, radius: int) -> Column:
    """simhash -> array<struct<block_id,block_value>> of radius+1 blocks
    (pigeonhole: a pair with <= radius differing bits agrees on >= 1 block)."""
    nblocks = radius + 1
    width = 64 // nblocks
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("block_id"),
                F.shiftrightunsigned(sim_col, i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("block_value"),
            )
            for i in range(nblocks)
        ]
    )


def simhash_candidates(
    df: DataFrame, cfg: PipelineConfig, id_col: str = "clip_id", sim_col: str = "simhash"
) -> DataFrame:
    """(id, simhash) -> candidate pairs with hamming <= radius, verified
    JVM-side with bit_count(xor)."""
    blocks = df.select(
        id_col,
        sim_col,
        F.explode(hamming_blocks(F.col(sim_col), cfg.hamming_radius)).alias("blk"),
    ).select(
        id_col, sim_col,
        F.col("blk.block_id").alias("block_id"),
        F.col("blk.block_value").alias("block_value"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = a.join(
        b,
        (F.col("a.block_id") == F.col("b.block_id"))
        & (F.col("a.block_value") == F.col("b.block_value"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id1"),
        F.col(f"b.{id_col}").alias("id2"),
        F.bit_count(
            F.col(f"a.{sim_col}").bitwiseXOR(F.col(f"b.{sim_col}"))
        ).alias("hamming"),
    )
    return (
        pairs.filter(F.col("hamming") <= cfg.hamming_radius)
        .dropDuplicates(["id1", "id2"])
    )
