"""ANN operators: brute-force baseline exactness + LSH recall measurement."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.ann import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_bruteforce_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    vecs = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    queries = emb.filter(F.col("vec_id") < 3)
    got = cosine_topk_bruteforce(emb, queries, k=4).collect()
    norms = np.linalg.norm(vecs, axis=1)
    for qid in range(3):
        qi = int(np.where(ids == qid)[0][0])
        sims = (vecs @ vecs[qi]) / (norms * norms[qi])
        sims_r = np.round(sims, 6)
        order = sorted(
            [(i, s) for i, s in zip(ids, sims_r) if i != qid],
            key=lambda t: (-t[1], t[0]),
        )[:4]
        expected = [(int(i), float(s)) for i, s in order]
        actual = sorted(
            [(r.vec_id, r.cos_sim) for r in got if r.query_id == qid],
            key=lambda t: (-t[1], t[0]),
        )
        assert actual == expected


def test_lsh_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_lsh(emb, queries, dim=64, k=5, n_bits=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 8 tables x 6 bits + multiprobe measured at 0.86 on this data
    assert recall >= 0.7, f"LSH ANN recall {recall:.2f} unexpectedly low"


def test_lsh_results_are_true_neighbors(spark, emb):
    """Every LSH hit is a real (correctly scored) neighbor — approximation
    affects which candidates are seen, never the scores."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact_scores = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in cosine_topk_bruteforce(emb, queries, k=500).collect()
    }
    for r in cosine_topk_lsh(emb, queries, dim=64, k=5, n_bits=6).collect():
        assert exact_scores[(r.query_id, r.vec_id)] == r.cos_sim


def test_embedding_neardup_salted_equals_unsalted(spark, emb):
    """Hot-bucket salting must not change the candidate/pair set: force
    every bucket hot (threshold 0) and compare against the plain join."""
    from text_similarity_node_spark.operators.dedup import embedding_neardup

    def pairs(hot_threshold):
        out = embedding_neardup(
            emb, "vec_id", "embedding", dim=64, threshold=0.3, n_bits=6,
            hot_bucket_threshold=hot_threshold, salt_buckets=4,
        )
        return {(r.id1, r.id2, round(r.cos_sim, 9)) for r in out.collect()}

    unsalted = pairs(hot_threshold=10**9)
    salted = pairs(hot_threshold=0)
    assert unsalted  # threshold 0.3 on sf0.01 embeddings yields pairs
    assert salted == unsalted


def test_ivf_recall_vs_bruteforce(spark, emb):
    """IVF at realistic nprobe: recall@5 vs the exact baseline improves
    with nprobe and reaches 1.0 at full probe (the oracle-checked anchor
    is q33; here the approximate regime is measured)."""
    from text_similarity_node_spark.operators.ann import (
        cosine_topk_ivf,
        train_ivf_centroids,
    )

    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    cents = train_ivf_centroids(emb, "vec_id", "embedding", n_lists=16)
    recalls = {}
    for nprobe in (2, 4, 16):
        got = {
            (r.query_id, r.vec_id)
            for r in cosine_topk_ivf(
                emb, queries, k=5, n_lists=16, nprobe=nprobe, centroids=cents
            ).collect()
        }
        recalls[nprobe] = len(got & exact) / len(exact)
    assert recalls[16] == 1.0, recalls
    assert recalls[4] >= recalls[2] - 0.05, recalls  # monotone-ish in nprobe
    assert recalls[4] >= 0.6, recalls  # probing 1/4 of lists finds most of top-5


def test_quantized_bound_is_sound():
    """The int8 error radius must dominate the true quantization error on
    arbitrary vectors — adversarial spreads included (near-zero tails,
    one dominant coordinate), where relative quantization error peaks."""
    rng = np.random.default_rng(7)
    dim = 64
    for trial in range(200):
        a = rng.normal(size=dim) * rng.choice([1e-3, 1.0, 50.0])
        b = rng.normal(size=dim)
        if trial % 3 == 0:
            b[0] *= 1000.0  # dominant-coordinate adversary
        sa, sb = np.abs(a).max() / 127.0, np.abs(b).max() / 127.0
        qa, qb = np.round(a / sa), np.round(b / sb)
        approx = sa * sb * float(qa @ qb)
        eps = sa * sb * (np.abs(qa).sum() / 2 + np.abs(qb).sum() / 2 + dim / 4)
        assert abs(float(a @ b) - approx) <= eps + 1e-12


def test_quantized_topk_equals_bruteforce_and_prunes(spark, emb):
    """Equality is the CONTRACT (sound bound + exact re-rank), not a
    measured recall; also record that the bound actually prunes — the
    candidate set must be well under the full scan."""
    from text_similarity_node_spark.operators.ann import (
        cosine_topk_quantized,
        dot_eps_cols,
        quantize_int8_udf,
    )

    queries = emb.filter(F.col("vec_id") < 20)
    exact = sorted(
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    )
    got = sorted(
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in cosine_topk_quantized(
            emb, queries, id_col="vec_id", vec_col="embedding", k=5, dim=64
        ).collect()
    )
    assert got == exact

    # pruning evidence: candidates per query << corpus size
    qz = emb.select("vec_id", quantize_int8_udf(F.col("embedding")).alias("z"))
    qq = queries.select(
        F.col("vec_id").alias("query_id"),
        quantize_int8_udf(F.col("embedding")).alias("zq"),
    )
    pair = qz.join(F.broadcast(qq), F.col("vec_id") != F.col("query_id"))
    approx, eps = dot_eps_cols(64)(F.col("zq"), F.col("z"))
    scored = pair.select(
        "query_id", "vec_id", approx.alias("a"), eps.alias("e")
    ).cache()
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy((F.col("a") - F.col("e")).desc())
    kth = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 5)
        .select("query_id", (F.col("a") - F.col("e")).alias("kth_lo"))
    )
    n_cand = (
        scored.join(kth, "query_id")
        .filter(F.col("a") + F.col("e") >= F.col("kth_lo") - 1e-6)
        .count()
    )
    n_total = scored.count()
    assert n_cand < 0.5 * n_total, (n_cand, n_total)
