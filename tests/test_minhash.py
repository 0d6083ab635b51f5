"""MinHash estimator quality — regression for the min-wise-independence
bug: an affine (a*x+b) mod p permutation over 32-bit-folded hashes barely
wraps, stays piecewise-monotone, and produced slot agreement 0.30 for a
true-Jaccard 0.92 pair.  The splitmix64 per-slot mix must estimate J
within ~4 sigma (sigma = sqrt(J(1-J)/k))."""

import math
import random

import numpy as np

from text_similarity_node_spark.functions.spark_udfs import hash_tokens_u64
from text_similarity_node_spark.operators.minhash import _slot_seeds, _splitmix64

K = 256
SEEDS = _slot_seeds(K, 7)


def _sig(tokens):
    h = hash_tokens_u64(sorted(set(tokens)))
    np.seterr(over="ignore")
    return (_splitmix64(h[None, :] ^ SEEDS[:, None]).min(axis=1) >> np.uint64(1))


def test_estimator_unbiased_across_j():
    random.seed(1)
    for target in (0.95, 0.8, 0.6, 0.4, 0.2):
        base = [f"tok{i}" for i in range(400)]
        n_keep = int(400 * 2 * target / (1 + target))
        var = base[:n_keep] + [f"new{i}" for i in range(400 - n_keep)]
        true_j = len(set(base) & set(var)) / len(set(base) | set(var))
        est = float((_sig(base) == _sig(var)).mean())
        sigma = math.sqrt(true_j * (1 - true_j) / K)
        assert abs(est - true_j) <= 4.5 * sigma, (target, true_j, est)


def test_single_new_token_cannot_flip_many_slots():
    """The failure mode of the broken permutation: one added token with a
    small hash flipped ~70% of slots."""
    base = [f"tok{i}" for i in range(300)]
    worst = 0
    for extra in range(50):
        var = base + [f"extra{extra}"]
        agree = float((_sig(base) == _sig(var)).mean())
        worst = max(worst, 1 - agree)
    # true J = 300/301 -> expected flip rate 1/301 per slot
    assert worst <= 0.05, f"one token flipped {worst:.2%} of slots"


def test_signature_deterministic_and_order_insensitive():
    toks = [f"t{i}" for i in range(100)]
    random.seed(2)
    shuffled = toks.copy()
    random.shuffle(shuffled)
    assert (_sig(toks) == _sig(shuffled)).all()


def test_signature_merge_is_union_sketch(spark):
    """sketch(A ∪ B) == elementwise min of sketch(A), sketch(B) — the
    mergeability property q113 builds per-language vocabulary sketches
    on.  Holds exactly because each slot is a min over per-token mixes."""
    from pyspark.sql import functions as F

    from text_similarity_node_spark.operators.minhash import minhash_signature_udf

    k = 64
    rows = [
        (0, ["a", "b", "c"]),
        (1, ["c", "d", "e", "f"]),
        (2, ["a", "b", "c", "d", "e", "f"]),  # union of 0 and 1
    ]
    df = spark.createDataFrame(rows, "rid int, toks array<string>")
    sigs = {
        r.rid: r.sig
        for r in df.withColumn(
            "sig", minhash_signature_udf(k, 42)(F.col("toks"))
        ).collect()
    }
    merged = [min(x, y) for x, y in zip(sigs[0], sigs[1])]
    assert merged == sigs[2]
