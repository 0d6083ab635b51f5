"""Bloom-filter membership prefilter for huge hash-set joins.

The exact decontamination op (``text_analysis.contamination_check``,
driver query q40) broadcasts the DISTINCT xxhash64 set of benchmark
grams — 8 bytes per gram.  That is the right call for a benchmark suite
(thousands of docs, MBs of hashes), but the same "is this gram in a
known set?" shape also appears with a HUGE known side: novelty scoring
against an entire prior training corpus, cross-snapshot dedup, or a
multi-TB blocklist.  At 10^10 known grams the exact broadcast is 80 GB
— undistributable — while a 1%-FPR Bloom bitmap over the same set is
~12 GB of *bits*, and a 0.1 %-FPR one ~18 GB; per executor that is one
allocation, shared across all its tasks via a TorrentBroadcast.

Semantics: a Bloom filter has NO false negatives by construction, so

    bloom-prefilter  ->  exact verify join on the survivors

returns byte-for-byte the exact-join answer; false positives only cost
verify work (bounded by fpr * corpus_grams extra rows into a now-skinny
shuffle join).  Driver query q80 proves this end-to-end against the
plain exact-SQL oracle: any false negative — a wrong m, a mismatched
probe mix, a build/probe domain drift — shows up as a missing output
row and a red driver hash.

From-scratch construction (no pyspark.ml.feature dependency; standard
Bloom math, Kirsch-Mitzenmacher double hashing):

* parameters: m = -n ln(p) / (ln 2)^2 bits, k = (m/n) ln 2 probes;
* positions: h1 = x, h2 = splitmix64(x) | 1; g_i(x) = (h1 + i*h2) mod m
  — two 64-bit mixes give k independent-enough probes (Kirsch &
  Mitzenmacher 2006: double hashing preserves the asymptotic FPR);
* build: one ``mapInPandas`` pass over the known-side hashes, ONE
  partial bitmap per partition, OR-reduced on the driver.  Driver
  traffic is partitions * m/8 bytes, never the gram set; callers bound
  the partition count with coalesce for very large m;
* probe: an Arrow-batched pandas UDF over the corpus hash column; the
  bitmap ships once per executor as a Spark broadcast.

All position math is vectorized numpy uint64 (wrapping arithmetic is
deterministic and identical on build and probe because both sides call
the same ``_positions``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "bloom_params",
    "build_bloom_bitmap",
    "bloom_contains",
    "bloom_contamination_check",
]


def bloom_params(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """Standard sizing: bits m (rounded up to a whole byte) and probe
    count k for ``n_items`` keys at target false-positive rate ``fpr``."""
    n = max(int(n_items), 1)
    m = int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2)))
    m = max((m + 7) // 8 * 8, 64)
    k = max(int(round(m / n * math.log(2))), 1)
    return m, k


def _splitmix64(y: np.ndarray) -> np.ndarray:
    # same public-domain finalizer the MinHash permutations use
    # (operators/minhash.py); full-avalanche bijection on uint64.
    y = y ^ (y >> np.uint64(30))
    y = y * np.uint64(0xBF58476D1CE4E5B9)
    y = y ^ (y >> np.uint64(27))
    y = y * np.uint64(0x94D049BB133111EB)
    y = y ^ (y >> np.uint64(31))
    return y


def _positions(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """(k, n) bit positions for hash array ``h`` (uint64 view of the
    signed xxhash64 column).  Kirsch-Mitzenmacher: g_i = h1 + i*h2 mod m,
    h2 forced odd so the stride never degenerates to 0."""
    h1 = h.astype(np.uint64, copy=False)
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).astype(np.int64)


def build_bloom_bitmap(
    hashes: DataFrame, hash_col: str, m: int, k: int, max_partitions: int = 64
) -> np.ndarray:
    """OR-reduce per-partition partial bitmaps into one uint8 array of
    m/8 bytes.  ``coalesce(max_partitions)`` bounds driver traffic to
    max_partitions * m/8 bytes regardless of the input's layout."""
    nbytes = m // 8

    def _partial(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            h = pdf.iloc[:, 0].to_numpy(dtype=np.int64, na_value=0)
            if len(h) == 0:
                continue
            seen = True
            pos = _positions(h.view(np.uint64), m, k).ravel()
            np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = (
        hashes.select(hash_col)
        .coalesce(max_partitions)
        .mapInPandas(_partial, schema="bm binary")
        .collect()
    )
    out = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row.bm, dtype=np.uint8)
    return out


def bloom_contains(
    spark: SparkSession, hash_col: Column, bitmap: np.ndarray, m: int, k: int
) -> Column:
    """Boolean membership column.  The bitmap rides a Spark broadcast —
    one copy per executor, shared by its tasks — not a per-task pickle."""
    bc = spark.sparkContext.broadcast(bitmap.tobytes())

    @F.pandas_udf(T.BooleanType())
    def _probe(s: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        h = s.to_numpy(dtype=np.int64, na_value=0)
        if len(h) == 0:
            return pd.Series([], dtype=bool)
        pos = _positions(h.view(np.uint64), m, k)
        bits = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=0).astype(bool))

    return _probe(hash_col)


def bloom_contamination_check(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    fpr: float = 0.01,
) -> DataFrame:
    """Decontamination via Bloom prefilter + exact verify — the exact
    semantics of ``text_analysis.contamination_check`` (flag every doc
    sharing >=1 word n-gram with the known set, with its distinct
    overlapping-gram count), re-shaped for a known side too large to
    broadcast exactly.

    Plan: known grams -> distinct xxhash64 -> Bloom bitmap (built
    distributively, OR-reduced);  corpus grams -> distinct (id, hash) ->
    Bloom probe (Arrow-batched) -> survivors (true hits + ~fpr of the
    rest) -> SHUFFLE hash join against the known hash set -> per-doc
    count.  The verify join's probe side is now tiny, so neither side
    broadcasts; the known set is read once, shuffled once on the 8-byte
    key.  No false negatives: q80 pins the output to the exact-join
    oracle byte-for-byte.
    """
    from ..functions import columns as C
    from .text_analysis import word_shingles

    spark = docs.sparkSession
    bench_grams = (
        bench.select(
            F.explode(word_shingles(C.word_tokens(F.col(text_col)), n)).alias("_g")
        )
        .select(F.xxhash64("_g").alias("_gh"))
        .distinct()
    )
    # the known side is consumed three times (count + bitmap build +
    # verify join); persist so the shingle scan runs once.  No unpersist
    # leak: the ContextCleaner drops the cache when the DataFrame is GCed
    # (same convention as lsh.py / simjoin.py).
    bench_grams = bench_grams.persist()
    n_bench = bench_grams.count()
    m, k = bloom_params(n_bench, fpr)
    bitmap = build_bloom_bitmap(bench_grams, "_gh", m, k)

    doc_grams = (
        docs.select(
            F.col(id_col),
            F.explode(
                word_shingles(C.word_tokens(F.col(text_col)), n)
            ).alias("_g"),
        )
        .select(id_col, F.xxhash64("_g").alias("_gh"))
        .distinct()
    )
    survivors = doc_grams.filter(
        bloom_contains(spark, F.col("_gh"), bitmap, m, k)
    )
    return (
        survivors.join(bench_grams, "_gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
