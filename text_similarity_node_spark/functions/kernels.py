"""Reference-parity similarity/distance kernels (SURVEY.md §2.1).

Pure-Python scalar kernels, one per reference algorithm, reproducing the
exact edge semantics of ``piotrmaciejbednarski/text-similarity-node``:

* dispatch pipeline: length validation -> quick answers -> case-fold
  preprocess -> per-algorithm compute
  (``src/engine/similarity_engine.cpp:196-280``,
  ``src/algorithms/base_algorithm.cpp:16-86``);
* quick answers for every algorithm (``base_algorithm.cpp:243-319``):
  both empty -> sim 1.0 / dist 0; one empty -> sim 0.0 / dist = other's
  codepoint length (even for Hamming/Jaccard!); identical (or fold-identical
  when case-insensitive) -> sim 1.0 / dist 0;
* fractional distances scaled x1000 and rounded half-away-from-zero
  (``src/algorithms/token_based.cpp:62-64`` etc.);
* the L-norm similarities are computed from the *quantized* integer distance
  (``src/algorithms/vector_based.cpp:260-323``) — sim = f(round(d*1000)/1000);
* multiset vs set Jaccard fork on preprocessing mode
  (``src/algorithms/token_based.cpp:17-43``);
* cosine CHARACTER-mode forks: ASCII pair -> 256-bin frequency cosine,
  otherwise binary-presence cosine (``src/algorithms/vector_based.cpp:33-256``);
* Levenshtein threshold banding applies only to non-ASCII pairs — the
  reference routes ASCII pairs to its SIMD path which ignores the threshold
  (``src/algorithms/levenshtein.cpp:85-99``).

These scalar kernels are the *semantic contract*; the Spark hot path uses
vectorized equivalents (``spark_udfs.py``) and built-in JVM expressions
(``columns.py``) that are tested against these.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Optional, Tuple

from ..config import Algorithm, AlgorithmConfig, Preprocessing
from .tokenize import tokenize
from .unicode import fold_chars_positional, fold_string


class KernelError(ValueError):
    """Typed kernel error mirroring the reference ErrorCode channel
    (``src/core/types.hpp:64-73``)."""

    def __init__(self, code: str, message: str):
        super().__init__(f"{code}: {message}")
        self.code = code


def _round1000(x: float) -> int:
    """std::round(x * 1000) — half away from zero (x is always >= 0 here)."""
    return int(math.floor(x * 1000.0 + 0.5))


# ---------------------------------------------------------------------------
# dispatch: quick answers + preprocessing
# ---------------------------------------------------------------------------


def _validate_lengths(s1: str, s2: str, cfg: AlgorithmConfig) -> None:
    # Byte-length validation, similarity_engine.cpp:560-576.
    limit = cfg.max_string_length
    if len(s1.encode("utf-8")) > limit or len(s2.encode("utf-8")) > limit:
        raise KernelError("InvalidInput", f"string exceeds maximum length {limit}")


def _quick_similarity(s1: str, s2: str, cfg: AlgorithmConfig) -> Optional[float]:
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    if not cfg.case_sensitive and fold_string(s1) == fold_string(s2):
        return 1.0
    return None


def _quick_distance(s1: str, s2: str, cfg: AlgorithmConfig) -> Optional[int]:
    if not s1 and not s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    if s1 == s2:
        return 0
    if not cfg.case_sensitive and fold_string(s1) == fold_string(s2):
        return 0
    return None


def _prep_positional(s: str, cfg: AlgorithmConfig) -> str:
    """Preprocess for positional kernels: table fold (preprocess_string)
    composed with the per-char comparison fold (unicode_chars_equal)."""
    if cfg.case_sensitive:
        return s
    return fold_chars_positional(fold_string(s))


# ---------------------------------------------------------------------------
# edit-distance family
# ---------------------------------------------------------------------------


def _lev_dp(a: str, b: str) -> int:
    """Single-row Levenshtein DP (levenshtein.cpp:118-166)."""
    if len(a) > len(b):
        a, b = b, a
    la = len(a)
    row = list(range(la + 1))
    for j, cb in enumerate(b, start=1):
        prev_diag = row[0]
        row[0] = j
        for i in range(1, la + 1):
            prev_cur = row[i]
            if a[i - 1] == cb:
                row[i] = prev_diag
            else:
                row[i] = 1 + min(row[i], row[i - 1], prev_diag)
            prev_diag = prev_cur
    return row[la]


def _lev_banded(a: str, b: str, max_distance: int) -> int:
    """Threshold-banded DP with early exit (levenshtein.cpp:168-246).
    Returns max_distance + 1 when the true distance exceeds the threshold."""
    if abs(len(a) - len(b)) > max_distance:
        return max_distance + 1
    la, lb = len(a), len(b)
    bw = max_distance + 1
    inf = max_distance + 1
    prev = [inf] * (2 * bw + 1)
    for i in range(min(bw, la) + 1):
        prev[bw + i] = i
    for j in range(1, lb + 1):
        cur = [inf] * (2 * bw + 1)
        min_i = j - bw if j > bw else 1
        max_i = min(la, j + bw)
        if j <= bw:
            cur[bw] = j
        found = False
        cb = b[j - 1]
        for i in range(min_i, max_i + 1):
            idx = bw + i - j
            if a[i - 1] == cb:
                cur[idx] = prev[idx]
            else:
                cost = inf
                if idx > 0:
                    cost = min(cost, cur[idx - 1] + 1)
                if idx < 2 * bw:
                    cost = min(cost, prev[idx + 1] + 1)
                cost = min(cost, prev[idx] + 1)
                cur[idx] = cost
            if cur[idx] <= max_distance:
                found = True
        if not found:
            return max_distance + 1
        prev = cur
    return min(prev[bw + la - lb], max_distance + 1)


def levenshtein_distance(s1: str, s2: str, cfg: AlgorithmConfig) -> int:
    a, b = _prep_positional(s1, cfg), _prep_positional(s2, cfg)
    # Reference quirk: the ASCII fast path bypasses the threshold band
    # (levenshtein.cpp:85-99 routes ASCII pairs to compute_distance_simd).
    if cfg.threshold is not None and not (s1.isascii() and s2.isascii()):
        return _lev_banded(a, b, int(cfg.threshold))
    return _lev_dp(a, b)


def osa_distance(s1: str, s2: str, cfg: AlgorithmConfig) -> int:
    """Damerau-Levenshtein, Optimal String Alignment variant
    (levenshtein.cpp:365-412; the 'unrestricted' entry point falls back to
    OSA, levenshtein.cpp:414-421)."""
    a, b = _prep_positional(s1, cfg), _prep_positional(s2, cfg)
    la, lb = len(a), len(b)
    prev2: List[int] = []
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                cur[j] = min(cur[j], prev2[j - 2] + cost)
        prev2, prev = prev, cur
    return prev[lb]


def hamming_distance(s1: str, s2: str, cfg: AlgorithmConfig) -> int:
    if len(s1) != len(s2):
        raise KernelError("InvalidInput", "Hamming distance requires equal-length strings")
    a, b = _prep_positional(s1, cfg), _prep_positional(s2, cfg)
    return sum(1 for x, y in zip(a, b) if x != y)


# ---------------------------------------------------------------------------
# Jaro family
# ---------------------------------------------------------------------------


def _jaro(a: str, b: str) -> float:
    """Jaro on pre-folded strings (phonetic.cpp:76-168)."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    search_range = max(la, lb) // 2
    if search_range > 0:
        search_range -= 1
    a_match = [False] * la
    b_match = [False] * lb
    matches = 0
    for i in range(la):
        low = i - search_range if i >= search_range else 0
        hi = min(i + search_range, lb - 1)
        for j in range(low, hi + 1):
            if b_match[j] or a[i] != b[j]:
                continue
            a_match[i] = True
            b_match[j] = True
            matches += 1
            break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(la):
        if a_match[i]:
            while k < lb and not b_match[k]:
                k += 1
            if k < lb:
                if a[i] != b[k]:
                    transpositions += 1
                k += 1
    transpositions //= 2  # pairs, integer division (phonetic.cpp:160)
    m = float(matches)
    jaro = (m / la + m / lb + (m - transpositions) / m) / 3.0
    return max(0.0, min(1.0, jaro))


def jaro_similarity(s1: str, s2: str, cfg: AlgorithmConfig) -> float:
    return _jaro(_prep_positional(s1, cfg), _prep_positional(s2, cfg))


def jaro_winkler_similarity(s1: str, s2: str, cfg: AlgorithmConfig) -> float:
    """phonetic.cpp:172-229: boost applies only when jaro >= threshold
    (default 0.7 — the same config field Levenshtein uses for banding);
    prefix capped at prefix_length (default 4, max 4); weight clamped
    [0, 0.25] (default 0.1)."""
    a, b = _prep_positional(s1, cfg), _prep_positional(s2, cfg)
    jaro = _jaro(a, b)
    threshold = cfg.threshold if cfg.threshold is not None else 0.7
    if jaro < threshold:
        return jaro
    max_prefix = cfg.prefix_length if cfg.prefix_length is not None else 4
    prefix = 0
    for x, y in zip(a[:max_prefix], b[:max_prefix]):
        if x != y:
            break
        prefix += 1
    if prefix == 0:
        return jaro
    p = cfg.prefix_weight if cfg.prefix_weight is not None else 0.1
    p = max(0.0, min(0.25, p))
    return max(0.0, min(1.0, jaro + prefix * p * (1.0 - jaro)))


# ---------------------------------------------------------------------------
# token-based family (multiset semantics via collections.Counter)
# ---------------------------------------------------------------------------


def _counters(s1: str, s2: str, cfg: AlgorithmConfig) -> Tuple[Counter, Counter]:
    return Counter(tokenize(s1, cfg)), Counter(tokenize(s2, cfg))


def _multiset_intersection(c1: Counter, c2: Counter) -> int:
    # Counter::intersect — min of counts (token_based.hpp:50-58)
    small, big = (c1, c2) if len(c1) <= len(c2) else (c2, c1)
    return sum(min(n, big[t]) for t, n in small.items())


def jaccard_similarity(s1: str, s2: str, cfg: AlgorithmConfig) -> float:
    """WORD mode -> set Jaccard; CHARACTER/NGRAM/NONE -> multiset Jaccard
    (token_based.cpp:17-43)."""
    if cfg.preprocessing == Preprocessing.WORD:
        set1 = set(tokenize(s1, cfg))
        set2 = set(tokenize(s2, cfg))
        if not set1 and not set2:
            return 1.0
        if not set1 or not set2:
            return 0.0
        inter = len(set1 & set2)
        union = len(set1) + len(set2) - inter
        return inter / union if union else 0.0
    c1, c2 = _counters(s1, s2, cfg)
    if not c1 and not c2:
        return 1.0
    if not c1 or not c2:
        return 0.0
    inter = _multiset_intersection(c1, c2)
    union = sum((c1 | c2).values())  # max of counts (token_based.hpp:60-67)
    return inter / union if union else 0.0


def dice_similarity(s1: str, s2: str, cfg: AlgorithmConfig) -> float:
    """Multiset Dice in every mode (token_based.cpp:163-222)."""
    c1, c2 = _counters(s1, s2, cfg)
    if not c1 and not c2:
        return 1.0
    if not c1 or not c2:
        return 0.0
    inter = _multiset_intersection(c1, c2)
    total = sum(c1.values()) + sum(c2.values())
    return 2.0 * inter / total if total else 0.0


def overlap_similarity(s1: str, s2: str, cfg: AlgorithmConfig) -> float:
    """Multiset overlap coefficient (token_based.cpp:226-284)."""
    c1, c2 = _counters(s1, s2, cfg)
    if not c1 and not c2:
        return 1.0
    if not c1 or not c2:
        return 0.0
    inter = _multiset_intersection(c1, c2)
    min_size = min(sum(c1.values()), sum(c2.values()))
    return inter / min_size if min_size else 0.0


def tversky_similarity(s1: str, s2: str, cfg: AlgorithmConfig) -> float:
    """Multiset Tversky index (token_based.cpp:288-360); alpha/beta required
    (validated at config level, base_algorithm.cpp:214-222)."""
    if cfg.alpha is None or cfg.beta is None:
        raise KernelError(
            "InvalidConfiguration", "Tversky algorithm requires alpha and beta parameters"
        )
    c1, c2 = _counters(s1, s2, cfg)
    if not c1 and not c2:
        return 1.0
    if not c1 or not c2:
        return 0.0
    inter = _multiset_intersection(c1, c2)
    diff1 = sum(c1.values()) - inter
    diff2 = sum(c2.values()) - inter
    denom = inter + cfg.alpha * diff1 + cfg.beta * diff2
    return inter / denom if denom else 0.0


# ---------------------------------------------------------------------------
# vector-based family
# ---------------------------------------------------------------------------


def _freq_cosine(c1: Dict, c2: Dict) -> float:
    if not c1 and not c2:
        return 1.0
    if not c1 or not c2:
        return 0.0
    if c1 == c2:  # identical-vector check, vector_based.cpp:96-110
        return 1.0
    mag1 = math.sqrt(sum(v * v for v in c1.values()))
    mag2 = math.sqrt(sum(v * v for v in c2.values()))
    if mag1 == 0.0 or mag2 == 0.0:
        return 0.0
    small, big = (c1, c2) if len(c1) <= len(c2) else (c2, c1)
    dot = sum(v * big.get(t, 0) for t, v in small.items())
    return max(0.0, min(1.0, dot / (mag1 * mag2)))


def cosine_similarity(s1: str, s2: str, cfg: AlgorithmConfig) -> float:
    """vector_based.cpp:33-256.  CHARACTER mode forks: ASCII pair ->
    char-frequency cosine; non-ASCII -> binary-presence cosine
    |A∩B|/sqrt(|A|·|B|) (the documented textdistance-compat gap)."""
    if cfg.preprocessing == Preprocessing.CHARACTER:
        a = s1 if cfg.case_sensitive else fold_string(s1)
        b = s2 if cfg.case_sensitive else fold_string(s2)
        if s1.isascii() and s2.isascii():
            return _freq_cosine(Counter(a), Counter(b))
        set1, set2 = set(a), set(b)
        if not set1 and not set2:
            return 1.0
        if not set1 or not set2:
            return 0.0
        inter = len(set1 & set2)
        denom = math.sqrt(len(set1) * len(set2))
        return inter / denom if denom else 0.0
    c1, c2 = _counters(s1, s2, cfg)
    return _freq_cosine(c1, c2)


def _lnorm_distance(s1: str, s2: str, cfg: AlgorithmConfig, norm: str) -> float:
    c1, c2 = _counters(s1, s2, cfg)
    terms = set(c1) | set(c2)
    diffs = [abs(c1.get(t, 0) - c2.get(t, 0)) for t in terms]
    if norm == "l2":
        return math.sqrt(sum(d * d for d in diffs))
    if norm == "l1":
        return float(sum(diffs))
    return float(max(diffs, default=0))


def euclidean_distance_raw(s1, s2, cfg) -> float:
    return _lnorm_distance(s1, s2, cfg, "l2")


def manhattan_distance_raw(s1, s2, cfg) -> float:
    return _lnorm_distance(s1, s2, cfg, "l1")


def chebyshev_distance_raw(s1, s2, cfg) -> float:
    return _lnorm_distance(s1, s2, cfg, "linf")


# ---------------------------------------------------------------------------
# public entry points (mirror engine calculateSimilarity / calculateDistance)
# ---------------------------------------------------------------------------

_SIM_TO_DIST_X1000 = {
    Algorithm.JARO,
    Algorithm.JARO_WINKLER,
    Algorithm.JACCARD,
    Algorithm.SORENSEN_DICE,
    Algorithm.OVERLAP,
    Algorithm.TVERSKY,
    Algorithm.COSINE,
}

_SIM_FUNCS = {
    Algorithm.JARO: jaro_similarity,
    Algorithm.JARO_WINKLER: jaro_winkler_similarity,
    Algorithm.JACCARD: jaccard_similarity,
    Algorithm.SORENSEN_DICE: dice_similarity,
    Algorithm.OVERLAP: overlap_similarity,
    Algorithm.TVERSKY: tversky_similarity,
    Algorithm.COSINE: cosine_similarity,
}

_LNORM_RAW = {
    Algorithm.EUCLIDEAN: euclidean_distance_raw,
    Algorithm.MANHATTAN: manhattan_distance_raw,
    Algorithm.CHEBYSHEV: chebyshev_distance_raw,
}


def _lnorm_sim_from_int_dist(algo: Algorithm, int_dist: int) -> float:
    d = int_dist / 1000.0  # similarity is computed from the quantized channel
    if algo == Algorithm.MANHATTAN:
        return 1.0 / (1.0 + d)
    return math.exp(-d)  # Euclidean and Chebyshev (vector_based.cpp:319,449)


def similarity(s1: str, s2: str, cfg: AlgorithmConfig) -> float:
    """``calculateSimilarity``: validate -> quick answer -> kernel."""
    cfg.validate()
    _validate_lengths(s1, s2, cfg)
    if cfg.algorithm == Algorithm.HAMMING and len(s1) != len(s2):
        # checked inside compute, but quick answers would otherwise hide the
        # error only for empty/identical inputs — which can't be unequal-length
        # except the one-empty case; reference quick answer fires first there.
        if s1 and s2:
            raise KernelError(
                "InvalidInput", "Hamming distance requires equal-length strings"
            )
    quick = _quick_similarity(s1, s2, cfg)
    if quick is not None:
        return quick
    algo = cfg.algorithm
    if algo == Algorithm.LEVENSHTEIN:
        d = levenshtein_distance(s1, s2, cfg)
        return 1.0 - d / max(len(s1), len(s2))
    if algo == Algorithm.DAMERAU_LEVENSHTEIN:
        d = osa_distance(s1, s2, cfg)
        return 1.0 - d / max(len(s1), len(s2))
    if algo == Algorithm.HAMMING:
        d = hamming_distance(s1, s2, cfg)
        return 1.0 - d / len(s1)
    if algo in _SIM_FUNCS:
        return _SIM_FUNCS[algo](s1, s2, cfg)
    if algo in _LNORM_RAW:
        int_dist = _round1000(_LNORM_RAW[algo](s1, s2, cfg))
        return _lnorm_sim_from_int_dist(algo, int_dist)
    raise KernelError("InvalidConfiguration", f"unknown algorithm {algo}")


def distance(s1: str, s2: str, cfg: AlgorithmConfig) -> int:
    """``calculateDistance``: integer channel; fractional metrics x1000."""
    cfg.validate()
    _validate_lengths(s1, s2, cfg)
    if cfg.algorithm == Algorithm.HAMMING and len(s1) != len(s2) and s1 and s2:
        raise KernelError("InvalidInput", "Hamming distance requires equal-length strings")
    quick = _quick_distance(s1, s2, cfg)
    if quick is not None:
        return quick
    algo = cfg.algorithm
    if algo == Algorithm.LEVENSHTEIN:
        return levenshtein_distance(s1, s2, cfg)
    if algo == Algorithm.DAMERAU_LEVENSHTEIN:
        return osa_distance(s1, s2, cfg)
    if algo == Algorithm.HAMMING:
        return hamming_distance(s1, s2, cfg)
    if algo in _SIM_FUNCS:
        return _round1000(1.0 - _SIM_FUNCS[algo](s1, s2, cfg))
    if algo in _LNORM_RAW:
        return _round1000(_LNORM_RAW[algo](s1, s2, cfg))
    raise KernelError("InvalidConfiguration", f"unknown algorithm {algo}")
