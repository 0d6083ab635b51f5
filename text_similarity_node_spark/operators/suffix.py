"""Substring/containment candidate pass (SURVEY.md §7.5).

LSH over whole-document shingle sets under-weights *containment*: a short
transcript embedded verbatim in a much longer one has low Jaccard yet is a
real duplicate (boilerplate prepends/appends).  The reference's kernels see
these pairs only through Overlap/Tversky; at scale we need a candidate
generator for them.

Design: per-document **winnowing fingerprints** (Schleimer, Wilkerson,
Aiken, SIGMOD 2003 — the public MOSS algorithm): rolling-hash every
``substring_min_len``-gram, then keep only the minimum hash in each window
of ``w`` consecutive positions.  Winnowing guarantees any shared substring
of length >= min_len + w - 1 yields at least one shared fingerprint, so the
equi-join on fingerprints is candidate-complete for long exact overlaps
while emitting O(len/w) rows per document.

Everything is one Arrow-batched numpy UDF (rolling hash via cumulative
polynomial trick) plus a plain equi-join — no per-row Python, no shuffle of
text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASE = 1_000_003
_MAX_GRAM = 256  # fingerprint grams longer than this are not supported

# BASE^j over natural uint64 wraparound — the rolling polynomial ring.
# (An earlier version used a Mersenne-61 modulus with a per-character
# Python loop: 1.9 µs/char, ~20 s for 343k transcripts at local[8].  The
# wraparound ring lets the k window terms be k vectorized shifted
# multiply-adds instead.)
_BPOW = np.empty(_MAX_GRAM, dtype=np.uint64)
_BPOW[0] = 1
with np.errstate(over="ignore"):  # wraparound is the point, not an error
    for _i in range(1, _MAX_GRAM):
        _BPOW[_i] = _BPOW[_i - 1] * np.uint64(_BASE)  # wraps mod 2^64


def _rolling_fingerprints(s: str, k: int, w: int) -> list[int]:
    """Winnowed k-gram rolling hashes of s (codepoint-level).
    h(i) = sum_{j<k} codes[i+j] * BASE^(k-1-j)  (mod 2^64), >>1 to fit the
    positive LongType range."""
    n = len(s)
    if n < k:
        return []
    np.seterr(over="ignore")
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    m = n - k + 1
    out = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        out += codes[j : j + m] * _BPOW[k - 1 - j]
    out >>= np.uint64(1)
    if m <= w:
        return [int(out.min())]
    # winnowing: min of each length-w window (robust variant: record each
    # distinct (hash) once when it becomes the window minimum)
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(out, w).min(axis=1)
    return np.unique(mins).astype(np.int64).tolist()


def fingerprint_udf(k: int, window: int):
    if k < 1 or k > _MAX_GRAM:
        raise ValueError(
            f"fingerprint gram length k={k} out of range [1, {_MAX_GRAM}] "
            "(_BPOW table size) — raise _MAX_GRAM if longer overlap grams "
            "are needed"
        )

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _rolling_fingerprints(t, k, window) if t is not None else []
                for t in texts
            ]
        )

    return udf


def containment_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 32,
    window: int = 16,
    fingerprint_cap: int = 64,
    return_metrics: bool = False,
):
    """df(id, text) -> candidate pairs (id1 < id2) sharing >= 1 winnowed
    fingerprint of a >= min_len-char exact overlap.

    ``fingerprint_cap`` drops degenerate fingerprints shared by more than
    cap documents: a boilerplate sentence present in f docs otherwise
    yields f²/2 candidate pairs that share ONLY the boilerplate (measured
    1.37M of 1.7M candidates on a 20k-clip corpus before this cap).  Such
    pairs are not duplicates; members that really are near-dups still reach
    verification through the MinHash pass.  With ``return_metrics`` the cap
    is never silent: (pairs, fp_metrics) where fp_metrics has one row per
    dropped fingerprint (fp, n_docs)."""
    fps = df.select(
        F.col(id_col).alias("rid"),
        F.explode(fingerprint_udf(min_len, window)(F.col(text_col))).alias("fp"),
    ).distinct()
    if return_metrics:
        # the metrics aggregate and the pair join both consume fps; without
        # this the fingerprint UDF runs twice.  persist, not localCheckpoint
        # (disk write serializes on shared-disk hardware); the
        # ContextCleaner unpersists the blocks once the plan is GC'd.
        fps = fps.persist()
    counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    # anti-join against the (small) hot set — broadcasting the keep-set
    # would ship every distinct fingerprint to every executor
    hot = counts.filter(F.col("n") > fingerprint_cap)
    fps = fps.join(F.broadcast(hot.select("fp")), "fp", "left_anti")
    a, b = fps.alias("a"), fps.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.rid") < F.col("b.rid")),
        )
        .select(F.col("a.rid").alias("id1"), F.col("b.rid").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    if return_metrics:
        return pairs, hot.select("fp", F.col("n").alias("n_docs"))
    return pairs
