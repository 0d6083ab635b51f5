"""MinHash signatures over shingle sets (SURVEY.md §7.3).

From-scratch DataFrame implementation (the mandate excludes
``pyspark.ml.feature.MinHashLSH``): k-permutation MinHash with universal
hashing ``(a*x + b) mod p`` over 64-bit token hashes, computed in one
Arrow-batched pandas UDF with numpy (no per-row Python).

MinHash estimates **set** Jaccard; the reference's NGRAM metric is
**multiset** Jaccard (``/root/reference/src/algorithms/token_based.cpp:30-43``)
— so LSH candidates are generated in set space and the exact multiset kernel
verifies (SURVEY.md §7 hard-part #1).  The recall harness
(tests/test_minhash_lsh.py) measures the resulting end-to-end recall.

Scale notes: the signature stage is embarrassingly parallel (mapInPandas, no
shuffle); signature width k*8 bytes/row (k=128 -> 1 KiB) is what shuffles
into the band stage, never the transcript or audio bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PipelineConfig
from ..functions.spark_udfs import hash_tokens_u64

# Mersenne prime 2^61-1: (a*h32 + b) stays < 2^63 when a,b < 2^31 and the
# token hash is folded to 32 bits, so int64 arithmetic never overflows.
_MERSENNE_P = (1 << 61) - 1


def _perm_params(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, size=k, dtype=np.int64)
    b = rng.randint(0, 1 << 31, size=k, dtype=np.int64)
    return a, b


def minhash_signature_udf(k: int, seed: int):
    """tokens array<string> -> array<bigint> of k MinHash slots.

    Empty token sets get an all--1 sentinel signature (they never collide
    with real bands; empty-vs-empty similarity is handled by the exact
    verify kernel's quick answers)."""
    a_params, b_params = _perm_params(k, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(tokens: pd.Series) -> pd.Series:
        a = a_params[:, None]
        b = b_params[:, None]
        out = []
        sentinel = [-1] * k
        for toks in tokens:
            if toks is None or len(toks) == 0:
                out.append(sentinel)
                continue
            h = hash_tokens_u64(list(dict.fromkeys(toks)))  # set semantics
            h32 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)[None, :]
            sig = ((a * h32 + b) % _MERSENNE_P).min(axis=1)
            out.append(sig.tolist())
        return pd.Series(out)

    return udf


def with_minhash(
    df: DataFrame, tokens_col: str, cfg: PipelineConfig, out_col: str = "minhash"
) -> DataFrame:
    return df.withColumn(
        out_col, minhash_signature_udf(cfg.minhash_k, cfg.minhash_seed)(F.col(tokens_col))
    )


def band_hashes(sig_col: Column, bands: int, rows: int) -> Column:
    """signature -> array of (band_id, band_hash) structs, JVM-side:
    slice + xxhash64 per band; exploded by the caller.  Empty-set sentinel
    signatures (slot0 == -1) produce no bands."""
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("band_id"),
                F.xxhash64(F.slice(sig_col, i * rows + 1, rows)).alias("band_hash"),
            )
            for i in range(bands)
        ]
    )
    return F.when(
        F.element_at(sig_col, 1) == -1, F.array().cast(
            "array<struct<band_id:int,band_hash:bigint>>"
        )
    ).otherwise(band_arr)


def explode_bands(df: DataFrame, id_col: str, sig_col: str, cfg: PipelineConfig) -> DataFrame:
    """(id, signature) -> (id, band_id, band_hash) rows for the LSH join."""
    return (
        df.select(
            id_col,
            F.explode(band_hashes(F.col(sig_col), cfg.lsh_bands, cfg.lsh_rows)).alias("b"),
        )
        .select(id_col, F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash"))
    )
