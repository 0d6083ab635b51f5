"""Vectorized pandas/Arrow UDF kernels (the slow-path escape hatch).

Per the north rule, ALL Python execution is Arrow-batched (`pandas_udf`) —
never row-at-a-time `F.udf`.  These wrap the reference-parity scalar kernels
(kernels.py) for the algorithms Spark has no built-in for (Damerau, Jaro,
Jaro-Winkler, the exact multiset measures when case-folding is needed), and
provide numpy-vectorized batch implementations where the per-pair work is
heavy (edit-distance DP).

Null semantics: a null input string produces a null result (DataFrame error
channel — the analogue of the reference's ``Result<T>`` wrapper,
``src/core/types.hpp:89-128``); kernels never throw across partitions.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import Algorithm, AlgorithmConfig
from . import kernels
from .unicode import fold_chars_positional, fold_string


def _pairwise_udf(fn: Callable[[str, str], Optional[float]], ret=T.DoubleType()):
    @F.pandas_udf(ret)
    def udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(s1, s2):
            if a is None or b is None:
                out.append(None)
                continue
            try:
                out.append(fn(a, b))
            except Exception:
                out.append(None)  # error channel: null, never a task failure
        return pd.Series(out, dtype="float64" if ret == T.DoubleType() else "object")

    return udf


def similarity_udf(cfg: AlgorithmConfig):
    """calculateSimilarity as a vectorized column function; full parity
    including quick answers and fold tables."""
    cfg.validate()

    def fn(a: str, b: str) -> float:
        return kernels.similarity(a, b, cfg)

    return _pairwise_udf(fn)


def distance_udf(cfg: AlgorithmConfig):
    """calculateDistance (integer channel, x1000 for fractional metrics)."""
    cfg.validate()

    def fn(a: str, b: str) -> float:
        return float(kernels.distance(a, b, cfg))

    return _pairwise_udf(fn)


# ---------------------------------------------------------------------------
# numpy-vectorized batch edit distance (hot verify path)
# ---------------------------------------------------------------------------


def _lev_numpy(a: str, b: str) -> int:
    """Row-DP with numpy vector ops along the row — O(min_len) numpy calls
    per pair instead of O(len^2) Python steps."""
    if len(a) > len(b):
        a, b = b, a
    if not a:
        return len(b)
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(ca) + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    offsets = np.arange(len(prev))
    for j in range(1, len(cb) + 1):
        cur[0] = j
        # substitution/deletion are elementwise over the previous row
        np.minimum(prev[:-1] + (ca != cb[j - 1]), prev[1:] + 1, out=cur[1:])
        # insertion (cur[i-1]+1) is a prefix scan:
        # cur[i] = min_{k<=i}(cur[k] + (i-k)) = i + mins(cur[k]-k)
        cur = np.minimum.accumulate(cur - offsets) + offsets
        prev, cur = cur, prev
    return int(prev[len(ca)])


def levenshtein_batch_udf(case_sensitive: bool = True):
    """Batch Levenshtein similarity with reference case-fold semantics.
    (For case-sensitive ASCII data prefer columns.levenshtein_similarity —
    pure JVM.)"""

    @F.pandas_udf(T.DoubleType())
    def udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        out = np.empty(len(s1), dtype=np.float64)
        for i, (a, b) in enumerate(zip(s1, s2)):
            if a is None or b is None:
                out[i] = np.nan
                continue
            if not case_sensitive:
                a = fold_chars_positional(fold_string(a))
                b = fold_chars_positional(fold_string(b))
            if a == b:
                out[i] = 1.0
            elif not a or not b:
                out[i] = 0.0
            else:
                out[i] = 1.0 - _lev_numpy(a, b) / max(len(a), len(b))
        return pd.Series(out)

    return udf


# ---------------------------------------------------------------------------
# token hashing for signatures (shared by minhash / simhash)
# ---------------------------------------------------------------------------

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def hash_tokens_u64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit FNV-1a of each token's UTF-8 bytes, vectorized
    over a padded byte matrix (no per-byte Python).  Stable across processes
    and executors (unlike Python's salted ``hash``)."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    width = int(lens.max())
    mat = np.zeros((n, width), dtype=np.uint8)
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    # scatter the ragged buffers into the padded matrix
    idx = np.repeat(np.arange(n), lens)
    col = np.arange(len(flat)) - np.repeat(np.cumsum(lens) - lens, lens)
    mat[idx, col] = flat
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    np.seterr(over="ignore")
    for j in range(width):
        active = lens > j
        h[active] = (h[active] ^ mat[active, j].astype(np.uint64)) * _FNV_PRIME
    # final avalanche (xorshift-multiply) to decorrelate short tokens
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return h
