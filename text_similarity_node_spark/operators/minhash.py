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

def _slot_seeds(k: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    lo = rng.randint(0, 1 << 32, size=k, dtype=np.uint64)
    hi = rng.randint(0, 1 << 32, size=k, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def _splitmix64(y: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Vigna): a full-avalanche
    bijection on uint64 — each slot's ordering of token hashes is an
    independent pseudo-random permutation.  NOTE: a small-range affine map
    like (a*x+b) mod p with x folded to 32 bits is NOT min-wise
    independent — it barely wraps, stays piecewise-monotone, and slot
    minima correlate (measured agreement 0.30 for a true Jaccard 0.92
    pair); the avalanche mix fixes exactly that."""
    y = y ^ (y >> np.uint64(30))
    y = y * np.uint64(0xBF58476D1CE4E5B9)
    y = y ^ (y >> np.uint64(27))
    y = y * np.uint64(0x94D049BB133111EB)
    y = y ^ (y >> np.uint64(31))
    return y


def minhash_signature_udf(k: int, seed: int):
    """tokens array<string> -> array<bigint> of k MinHash slots
    (min over tokens of splitmix64(h ^ slot_seed), per slot).

    Empty token sets get an all--1 sentinel signature (they never collide
    with real bands; empty-vs-empty similarity is handled by the exact
    verify kernel's quick answers)."""
    seeds = _slot_seeds(k, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(tokens: pd.Series) -> pd.Series:
        """Per-row numpy on purpose: the ~125x250 mix matrix per row stays
        L2-cache-resident.  Whole-batch variants (flat concat + per-slot 1D
        splitmix, or chunked 2D minimum.reduceat) were measured 1.7-10x
        slower — reduceat's per-element dispatch plus DRAM-sized
        temporaries lose to small cache-hot matrices."""
        out = []
        sentinel = [-1] * k
        np.seterr(over="ignore")
        for toks in tokens:
            if toks is None or len(toks) == 0:
                out.append(sentinel)
                continue
            h = hash_tokens_u64(list(dict.fromkeys(toks)))  # set semantics
            mixed = _splitmix64(h[None, :] ^ seeds[:, None])
            # >>1 keeps values in the positive int64 range (bigint column)
            sig = (mixed.min(axis=1) >> np.uint64(1)).astype(np.int64)
            out.append(sig.tolist())
        return pd.Series(out)

    return udf


def with_minhash(
    df: DataFrame, tokens_col: str, cfg: PipelineConfig, out_col: str = "minhash"
) -> DataFrame:
    return df.withColumn(
        out_col, minhash_signature_udf(cfg.minhash_k, cfg.minhash_seed)(F.col(tokens_col))
    )


@F.pandas_udf(T.DoubleType())
def signature_agreement_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Fraction of agreeing MinHash slots — an unbiased estimator of set
    Jaccard (E[agreement] = J).  Whole-batch numpy: the Arrow batch of
    fixed-width signatures is stacked into one (n, k) matrix per side and
    compared in a single vector op (the per-row loop this replaced cost
    ~30 s on a 3.5M-pair candidate set; this shape is ~1 s)."""
    n = len(s1)
    out = np.zeros(n, dtype=np.float64)
    valid = (s1.notna() & s2.notna()).to_numpy()
    if valid.any():
        a = np.stack(s1[valid].to_numpy())
        b = np.stack(s2[valid].to_numpy())
        out[valid] = (a == b).mean(axis=1)
    return pd.Series(out)


def signature_agreement_col(s1, s2, k: int):
    """Positional slot-agreement fraction as a JVM zip_with/filter/size
    expression — no Arrow transfer, no Python workers (the pandas-UDF
    variant ships both 1 KiB signatures per pair through Arrow and
    anti-scales with worker count: 50.4 s vs 2.6 s on 2.9M pairs at
    local[32])."""
    matched = F.size(F.filter(F.zip_with(s1, s2, lambda a, b: a == b), lambda x: x))
    return matched.cast("double") / float(k)


def minhash_agreement_col(s1, s2, k: int):
    """Slot-agreement for MINHASH signatures via native array_intersect.

    Valid because slot values are splitmix64 outputs: two slots agree in
    value iff they agree positionally up to a ~2^-63 collision — each slot
    uses a distinct seed, so equal values across different slots don't
    occur in practice.  PRECONDITION: signatures must not contain duplicate
    slot values — real signatures satisfy this, but the all-(-1) sentinel
    for empty-token docs does NOT (array_intersect's set semantics collapse
    it to one element, scoring sentinel-vs-sentinel 1/k where the
    positional estimator says 1.0); callers special-case sentinels
    (prefilter_candidates passes them through to the exact verify).
    array_intersect is a native hash-set expression
    (no per-element lambda interpretation, no struct-array allocation):
    measured on a 7.4M-pair candidate set, 34.2 s @ local[8] -> 12.3 s @
    local[32] (scales 2.8x) vs zip_with's 18.1 s -> 14.4 s (latency-flat
    and slower at full parallelism)."""
    return F.size(F.array_intersect(s1, s2)).cast("double") / float(k)


def token_stats_cols(tokens_col) -> tuple[Column, Column]:
    """(n_distinct, n_total) of a token array — native JVM expressions, no
    shuffle.  Carried on the signature table to make the set-space
    prefilter sound for the MULTISET verify metric (see
    prefilter_candidates)."""
    return (
        F.size(F.array_distinct(tokens_col)).cast("int"),
        F.size(tokens_col).cast("int"),
    )


def prefilter_candidates(
    pairs: DataFrame,
    signatures: DataFrame,
    cfg: PipelineConfig,
    id_col: str = "clip_id",
    tag_col: str | None = None,
) -> DataFrame:
    """Drop candidate pairs that provably cannot pass the exact MULTISET-
    Jaccard verify, using the estimated SET-Jaccard (signature slot
    agreement).

    The two metrics diverge when shared grams repeat: with per-gram counts
    c, J_multi = sum(min c)/sum(max c) can exceed J_set without bound
    (A={a x100,b}, B={a x100,c}: 0.98 vs 0.33), so a flat set-space gate
    silently drops repeated-gram true positives.  The sound per-pair
    bound used here (s_i = |distinct|, T_i = |total|, c = |common
    distinct|):

        M := sum over common g of min(cA, cB)  <=  c + min(T1-s1, T2-s2)
            (each of the s_i - c non-common distinct grams consumes at
             least one of doc i's T_i tokens)
        sum(min) + sum(max) = T1 + T2   (min+max = a+b per gram)
        =>  J_multi = M / (T1+T2-M)  <=  Mhi / (T1+T2-Mhi)
            (the rhs is increasing in M; Mhi <= min(T1,T2) always)

    On repeat-free docs (T == s) this degenerates to exactly the set-J
    gate (full round-1 selectivity), and it loosens only as fast as true
    repetition requires — a cruder max-multiplicity bound (T-s+1) was
    measured to neuter the filter entirely and ~double pipeline cost.
    c is upper-bounded from the agreement estimate via
    c = J(s1+s2)/(1+J) (increasing in J, J <= est + margin) and by
    min(s1, s2).  Requires ``n_distinct``/``n_total`` columns on
    signatures (token_stats_cols); without them the repeat-free bound
    (J_multi <= J_set) applies.  Sentinel (empty-token) signatures carry
    no information and bypass the filter — the exact verify decides them.
    Soundness is asserted by the repeated-gram regression test in
    tests/test_banded_and_agreement.py."""
    if cfg.minhash_prefilter_margin <= 0:
        # margin=0 disables the filter (config.py) — but a tagging caller
        # still expects the tag column, so every pair is tagged kept
        if tag_col is not None:
            return pairs.withColumn(tag_col, F.lit(True))
        return pairs
    has_ts = {"n_distinct", "n_total"} <= set(signatures.columns)
    cols1 = [F.col(id_col).alias("id1"), F.col("minhash").alias("_sig1")]
    cols2 = [F.col(id_col).alias("id2"), F.col("minhash").alias("_sig2")]
    if has_ts:
        cols1 += [F.col("n_distinct").alias("_s1"), F.col("n_total").alias("_t1")]
        cols2 += [F.col("n_distinct").alias("_s2"), F.col("n_total").alias("_t2")]
    s1 = signatures.select(*cols1)
    s2 = signatures.select(*cols2)
    est = minhash_agreement_col(F.col("_sig1"), F.col("_sig2"), cfg.minhash_k)
    est_hi = F.least(est + F.lit(cfg.minhash_prefilter_margin), F.lit(1.0))
    if has_ts:
        c_hi = F.least(
            est_hi * (F.col("_s1") + F.col("_s2")) / (F.lit(1.0) + est_hi),
            F.least(F.col("_s1"), F.col("_s2")).cast("double"),
        )
        m_hi = c_hi + F.least(
            F.col("_t1") - F.col("_s1"), F.col("_t2") - F.col("_s2")
        ).cast("double")
        tt = (F.col("_t1") + F.col("_t2")).cast("double")
        jm_bound = m_hi / (tt - m_hi)
    else:
        jm_bound = est_hi
    sentinel = (F.element_at(F.col("_sig1"), 1) == -1) | (
        F.element_at(F.col("_sig2"), 1) == -1
    )
    keep = sentinel | (jm_bound >= F.lit(cfg.verify_threshold))
    joined = pairs.join(s1, "id1").join(s2, "id2")
    if tag_col is not None:
        # tag instead of filter: lets a caller count kept + dropped in
        # ONE aggregation job over the tagged frame instead of two
        # count actions over pre- and post-filter frames
        out = joined.withColumn(tag_col, keep).drop("_sig1", "_sig2")
    else:
        out = joined.filter(keep).drop("_sig1", "_sig2")
    return out.drop("_s1", "_s2", "_t1", "_t2") if has_ts else out


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
