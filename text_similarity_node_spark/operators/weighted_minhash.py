"""Weighted MinHash via Improved Consistent Weighted Sampling (ICWS).

The scale-path candidate generator for the WEIGHTED Jaccard metric

    J_w(A, B) = sum_t min(w_A(t), w_B(t)) / sum_t max(w_A(t), w_B(t))

that q73 verifies exactly (TF-IDF-weighted near-dup scoring — the
boilerplate-robust variant of the reference's multiset Jaccard,
/root/reference/src/algorithms/token_based.cpp:30-43, which is itself the
integer-weight special case w = term count).  Plain MinHash samples each
distinct token uniformly, so it estimates SET Jaccard and is blind to
weights; ICWS (Ioffe, "Improved Consistent Weighted Sampling", ICDM 2010 —
public construction, implemented here from the paper's equations) samples
token t with probability proportional to w(t) *consistently* across
documents, giving the exact exchangeability property

    P(slot_i(A) == slot_i(B)) = J_w(A, B)

per independent slot — so the existing banding algebra (band_hashes, the
salted skew-aware lsh.candidate_pairs join, the S-curve recall math) applies
unchanged to weighted signatures.

Construction per slot i and token t with weight w > 0 (all randomness is a
deterministic function of (token, slot), which is what makes the sampling
"consistent" — two documents sharing a token draw the SAME r, c, beta for
it):

    r    ~ Gamma(2, 1)   = -ln(u1 * u2)
    c    ~ Gamma(2, 1)   = -ln(v1 * v2)
    beta ~ Uniform[0, 1)

    t_k  = floor(ln(w) / r + beta)
    ln y = r * (t_k - beta)
    ln a = ln c - ln y - r

    slot value = mix(token_hash, t_k) of the argmin-ln(a) token

The five uniforms come from splitmix64 streams keyed on
token_hash ^ slot_seed — full-avalanche, the same discipline as the
unweighted signatures (operators/minhash.py).  The slot encodes BOTH the
winning token and its quantized level t_k: two documents agree on a slot
iff ICWS sampled the same (token, level), which is exactly the event whose
probability is J_w (agreeing on the token but at different weight levels
must NOT count as agreement).

Scale notes: signature stage is embarrassingly parallel (one Arrow batch
in, k int64s out per doc; no shuffle); k*8 bytes/row shuffles into the band
join, never the token/weight arrays.  Per-row numpy keeps the (k x m)
matrices L2-resident for m ~ 100-1000 tokens/doc — the same measured
tradeoff as minhash.py's per-row loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .minhash import _slot_seeds, _splitmix64
from ..functions.spark_udfs import hash_tokens_u64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_TO_UNIT = 1.0 / 18446744073709551616.0  # 2**-64


def _uniforms(base: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic Uniform(0,1) matrix from a uint64 matrix: one
    splitmix64 step per stream index.  Offset by +1 ulp-ish so values are
    strictly in (0, 1) — ln() never sees 0."""
    mixed = _splitmix64(base + np.uint64(stream + 1) * _GOLDEN)
    return (mixed.astype(np.float64) + 0.5) * _TO_UNIT


def icws_signature_udf(k: int, seed: int):
    """(tokens array<string>, weights array<bigint>) -> array<bigint>:
    k ICWS slots.  Weights are the integer micro-weights of the exact
    metric (q73's tf*1e6 div df channel); rows with w <= 0 are ignored.
    Empty/all-nonpositive docs get the all--1 sentinel (band_hashes emits
    no bands for it, same contract as unweighted MinHash)."""
    seeds = _slot_seeds(k, seed)  # (k,) uint64

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(tokens: pd.Series, weights: pd.Series) -> pd.Series:
        out = []
        sentinel = [-1] * k
        np.seterr(over="ignore")
        for toks, ws in zip(tokens, weights):
            if toks is None or ws is None or len(toks) == 0:
                out.append(sentinel)
                continue
            w = np.asarray(ws, dtype=np.float64)
            keep = w > 0
            if not keep.any():
                out.append(sentinel)
                continue
            # consistent per-token randomness: base matrix (k, m)
            h = hash_tokens_u64(list(toks))[keep]
            lnw = np.log(w[keep])  # (m,)
            base = h[None, :] ^ seeds[:, None]  # (k, m) uint64
            r = -np.log(_uniforms(base, 0) * _uniforms(base, 1))  # Gamma(2,1)
            c = -np.log(_uniforms(base, 2) * _uniforms(base, 3))  # Gamma(2,1)
            beta = _uniforms(base, 4)
            t_k = np.floor(lnw[None, :] / r + beta)
            ln_y = r * (t_k - beta)
            ln_a = np.log(c) - ln_y - r
            best = np.argmin(ln_a, axis=1)  # (k,)
            rows = np.arange(k)
            # slot encodes (token, level): mix token hash with the level
            lvl = t_k[rows, best].astype(np.int64).astype(np.uint64)
            slot = _splitmix64(h[best] + lvl * _GOLDEN)
            out.append((slot >> np.uint64(1)).astype(np.int64).tolist())
        return pd.Series(out)

    return udf


def with_weighted_minhash(
    df,
    tokens_col: str,
    weights_col: str,
    k: int,
    seed: int,
    out_col: str = "wminhash",
):
    """Attach ICWS signatures.  ``df`` carries per-doc aligned arrays
    (tokens, integer weights) — the collect_list shape the weighting
    aggregation already produces."""
    return df.withColumn(
        out_col, icws_signature_udf(k, seed)(F.col(tokens_col), F.col(weights_col))
    )
