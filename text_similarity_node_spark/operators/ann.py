"""Approximate nearest neighbor over embedding columns.

Two paths (training-data pipeline ops):

* ``cosine_topk_bruteforce`` — the exact baseline: broadcast the (small)
  query set, JVM-side dot products (zip_with + aggregate), window top-k.
  O(N * Q); right whenever Q is small — and the plan the optimizer would
  pick anyway at that shape (one scan, no shuffle of the corpus).
* ``cosine_topk_lsh`` — the scale path: random-hyperplane signatures bucket
  the corpus; each query probes only its own bucket (plus multi-probe
  neighbors at Hamming distance 1), turning O(N*Q) into O(N/2^b * Q) at a
  measured recall cost.  Hyperplanes are seeded and broadcast — fully
  deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import columns as C


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        F.round(C.cosine_sim_vec(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim)


def rhp_bucket_udf(dim: int, n_bits: int, seed: int):
    """Random-hyperplane sign bucket of an embedding (int bucket id)."""
    planes = _hyperplanes(dim, n_bits, seed)

    @F.pandas_udf(T.IntegerType())
    def udf(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int32)
        for i, v in enumerate(vecs):
            if v is None:
                out[i] = -1
                continue
            signs = (planes @ np.asarray(v, dtype=np.float64)) > 0
            out[i] = int(signs @ (1 << np.arange(n_bits)))
        return pd.Series(out)

    return udf


def rhp_buckets_udf(dim: int, n_bits: int, n_tables: int, seed: int):
    """L independent RHP buckets per vector (array<int>, one per table) —
    the classic multi-table LSH layout: a true neighbor missed by one table
    is caught by another; recall ~ 1 - (1 - p^b)^L."""
    tables = [
        _hyperplanes(dim, n_bits, seed + 1000 * t) for t in range(n_tables)
    ]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def udf(vecs: pd.Series) -> pd.Series:
        pows = 1 << np.arange(n_bits)
        out = []
        for v in vecs:
            if v is None:
                out.append([])
                continue
            x = np.asarray(v, dtype=np.float64)
            out.append(
                [int(((planes @ x) > 0) @ pows) for planes in tables]
            )
        return pd.Series(out)

    return udf


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_bits: int = 6,
    n_tables: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Multi-table bucketed ANN: L independent RHP tables; a query probes
    its bucket in every table (plus, with multiprobe, all buckets at
    Hamming distance 1), candidates are unioned and exactly rescored."""
    buckets = rhp_buckets_udf(dim, n_bits, n_tables, seed)
    c = (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("bkts", buckets(F.col("v")))
        .select(
            "vec_id", "v",
            F.posexplode("bkts").alias("table_id", "bucket"),
        )
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("bkts", buckets(F.col("qv")))
        .select(
            "query_id", "qv",
            F.posexplode("bkts").alias("table_id", "qbucket"),
        )
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"), *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)
            ]
        )
        q = q.withColumn("bucket", F.explode(probes)).drop("qbucket")
    else:
        q = q.withColumnRenamed("qbucket", "bucket")
    scored = c.join(F.broadcast(q), ["table_id", "bucket"]).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(C.cosine_sim_vec(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
