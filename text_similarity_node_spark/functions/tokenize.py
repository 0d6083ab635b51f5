"""Reference-parity tokenizers (SURVEY.md §2.2).

Semantics from ``/root/reference/src/algorithms/base_algorithm.cpp:128-205``:

* CHARACTER — one token per Unicode codepoint (Python ``str`` iteration is
  codepoint-level, matching the reference's ``std::u32string``).
* WORD — regex ``\\b\\w+\\b``.  The reference applies ``std::regex`` to the
  raw UTF-8 *bytes*, so ``\\w`` is effectively ASCII-classed; we use
  ``re.ASCII`` to match.  (On multibyte text the reference's byte-regex can
  split inside codepoints; for ASCII-word text — the practical domain — the
  two agree.)
* NGRAM — contiguous codepoint windows of size n; **if the string is shorter
  than n, the whole string is the single token** (base_algorithm.cpp:192-196);
  empty string -> no tokens; n == 0 is invalid config.
* NONE — the whole string is one token.

Case-insensitivity lowercases the whole string with the reference table fold
*before* tokenizing (base_algorithm.cpp:112-126).
"""

from __future__ import annotations

import re
from typing import List

from ..config import AlgorithmConfig, Preprocessing
from .unicode import fold_string

_WORD_RE = re.compile(r"\b\w+\b", re.ASCII)


def ngrams(s: str, n: int) -> List[str]:
    """Codepoint n-gram shingles with the reference's short-string rule."""
    if n <= 0:
        raise ValueError("ngram_size must be >= 1")
    if not s:
        return []
    if len(s) < n:
        return [s]
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def words(s: str) -> List[str]:
    return _WORD_RE.findall(s)


def tokenize(s: str, cfg: AlgorithmConfig) -> List[str]:
    """``BaseAlgorithm::tokenize_string`` with the preprocess step applied."""
    if not cfg.case_sensitive and s:
        s = fold_string(s)
    mode = cfg.preprocessing
    if mode == Preprocessing.CHARACTER:
        return list(s)
    if mode == Preprocessing.WORD:
        return words(s)
    if mode == Preprocessing.NGRAM:
        return ngrams(s, cfg.ngram_size)
    return [s]
