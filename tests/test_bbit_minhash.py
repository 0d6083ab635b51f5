"""1-bit MinHash: packing layout, JVM Hamming/estimator expressions,
estimator accuracy, and end-to-end near-exact dedup recall/precision."""

import itertools

import numpy as np
from pyspark.sql import functions as F

from text_similarity_node_spark.operators.bbit_minhash import (
    bbit_neardup_pairs,
    bit_bands,
    hamming_bits_col,
    jaccard_estimate_col,
    pack_bits_udf,
)
from text_similarity_node_spark.operators.minhash import minhash_signature_udf

K = 256


def _pack_py(sig):
    words = []
    for w in range((len(sig) + 63) // 64):
        acc = 0
        for j in range(64):
            idx = w * 64 + j
            if idx < len(sig) and (sig[idx] & 1):
                acc |= 1 << j
        # int64 wrap
        words.append(acc - (1 << 64) if acc >= (1 << 63) else acc)
    return words


def test_pack_layout_matches_reference(spark):
    rng = np.random.RandomState(3)
    sigs = [rng.randint(0, 1 << 62, size=K).tolist() for _ in range(5)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "id int, sig array<bigint>"
    )
    got = {
        r["id"]: r["p"]
        for r in df.select("id", pack_bits_udf(K)(F.col("sig")).alias("p")).collect()
    }
    for i, s in enumerate(sigs):
        assert got[i] == _pack_py(s), f"row {i}"


def test_hamming_and_estimator_exact(spark):
    # two packed signatures differing in a known number of bits
    a = [0, 0, 0, 0]
    b = [0b1011, 1 << 40, 0, -1]  # 3 + 1 + 0 + 64 = 68 differing bits
    df = spark.createDataFrame(
        [(a, b)], "p1 array<bigint>, p2 array<bigint>"
    )
    row = df.select(
        hamming_bits_col(F.col("p1"), F.col("p2")).alias("h"),
        jaccard_estimate_col(F.col("p1"), F.col("p2"), K).alias("j"),
    ).collect()[0]
    assert row["h"] == 68
    assert abs(row["j"] - (2 * (1 - 68 / K) - 1)) < 1e-12


def test_estimator_tracks_exact_jaccard(spark):
    # token sets with controlled overlap; k=256 keeps |est - J| small
    rows = []
    base = [f"t{i}" for i in range(100)]
    for i, keep in enumerate([100, 90, 75, 50]):
        rows.append((i, base[:keep] + [f"x{i}_{j}" for j in range(100 - keep)]))
    df = spark.createDataFrame(rows, "id int, toks array<string>")
    sig = minhash_signature_udf(K, 1337)(F.col("toks"))
    packed = df.select("id", "toks", pack_bits_udf(K)(sig).alias("p"))
    a = packed.alias("a")
    b = packed.alias("b")
    pairs = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.toks").alias("t1"),
            F.col("b.toks").alias("t2"),
            jaccard_estimate_col(F.col("a.p"), F.col("b.p"), K).alias("est"),
        )
        .collect()
    )
    assert len(pairs) == 6
    for r in pairs:
        s1, s2 = set(r["t1"]), set(r["t2"])
        j = len(s1 & s2) / len(s1 | s2)
        assert abs(r["est"] - j) < 0.15, (r["id1"], r["id2"], r["est"], j)


def test_bit_bands_shape(spark):
    df = spark.createDataFrame([(1, [0, -1, 5, 9])], "id int, p array<bigint>")
    bands = bit_bands(df, "id", "p", band_bits=16, n_words=4).collect()
    assert len(bands) == 16  # 4 words x 4 groups of 16 bits
    by_band = {r["band_id"]: r["band_hash"] for r in bands}
    assert by_band[0] == 0  # word 0 low 16 bits
    assert by_band[4] == 0xFFFF  # word 1 (-1) any group = all ones
    assert by_band[8] == 5 and by_band[9] == 0
    assert all(0 <= v <= 0xFFFF for v in by_band.values())


def test_neardup_end_to_end(spark):
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(60):
        toks = [vocab[v] for v in rng.choice(500, size=40, replace=False)]
        rows.append((i, toks))
        if i % 6 == 0:  # near-exact copy: one token swapped
            dup = list(toks)
            dup[-1] = f"u{i}"
            rows.append((i + 1000, dup))
    df = spark.createDataFrame(rows, "id int, toks array<string>")
    got = {
        tuple(sorted((r["id1"], r["id2"])))
        for r in bbit_neardup_pairs(df, "id", "toks", threshold=0.9).collect()
    }
    # brute force truth on distinct-token jaccard
    truth = set()
    for (i1, t1), (i2, t2) in itertools.combinations(rows, 2):
        s1, s2 = set(t1), set(t2)
        if len(s1 & s2) / len(s1 | s2) >= 0.9:
            truth.add(tuple(sorted((i1, i2))))
    assert truth  # the planted copies are in truth
    assert got == truth
