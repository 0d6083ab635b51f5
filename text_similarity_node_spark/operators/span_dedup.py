"""Exact-substring span dedup: corpus-wide duplicated token-window coverage.

The operator behind "remove any 50-token span that appears more than once
in the corpus" (Lee et al., "Deduplicating Training Data Makes Language
Models Better", ACL 2022 — the exact-substring dedup pass; public).  Doc-
level dedup (exact/MinHash/SimHash tiers) keeps a document that merely
*contains* a viral paragraph; span dedup measures and removes the repeated
span itself.

Pipeline shape (every step a standard relational op — no UDF at all):

  tokenize -> posexplode W-token sliding windows (one row per (doc, p))
  -> count occurrences per window text          (the only wide shuffle)
  -> semi-join flagged windows back to positions
  -> per-doc interval merge (gaps-and-islands over a window function)
  -> covered-token count per doc

Scale notes: the window-count shuffle carries the window TEXT here so the
DuckDB oracle can restate it verbatim; at 100 TB the key is a 64-bit
rolling hash of the window (xxhash64 column — same plan, 8-byte keys) and
the per-window count uses map-side partial aggregation.  The interval
merge is a per-doc sort inside a window function — Spark executes it
within the doc's partition after one hash exchange on doc_id.  The
paper's own suffix-array construction is single-node; the sliding-window
formulation finds exactly the same >= W-token repeats in one shuffle.
(When the corpus genuinely needs suffix ORDER — arbitrary-length exact
thresholds, longest-repeat queries — `operators/suffix_array.py` builds
the suffix array distributively via prefix doubling, at the cost of
log2(L) exchanges instead of this pass's one.)

Reference ground: substring containment semantics sit next to the
reference's sequence kernels (/root/reference/src/algorithms/ — LCS
family); the corpus-wide span pass is distributed machinery the reference
has no analogue for, same status as winnowing (operators/suffix.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def duplicated_span_coverage(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    w: int = 15,
) -> DataFrame:
    """(id, tokens array<string>) -> (id, n_tokens, n_covered): per doc,
    how many token positions are covered by some W-token window whose
    exact text occurs at >= 2 (doc, position) places corpus-wide.  Docs
    with zero flagged windows are omitted (callers left-join if they
    need explicit zeros).  n_covered is exact: overlapping/adjacent
    flagged spans are merged (gaps-and-islands) before counting."""
    toks = docs.select(
        F.col(id_col), F.col(tokens_col).alias("_t"),
        F.size(tokens_col).alias("n_tokens"),
    ).filter(F.col("n_tokens") >= w)

    # one row per window position p (1-based), key = the window text
    wins = toks.select(
        id_col,
        "n_tokens",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("n_tokens") - (w - 1)),
                lambda i: F.concat_ws(" ", F.slice("_t", i, w)),
            )
        ).alias("_i", "win"),
    ).select(id_col, "n_tokens", (F.col("_i") + 1).alias("p"), "win")

    dup = (
        wins.groupBy("win").agg(F.count(F.lit(1)).alias("_m"))
        .filter(F.col("_m") > 1)
        .select("win")
    )
    flagged = wins.join(dup, "win", "left_semi").select(
        id_col, "n_tokens", "p", (F.col("p") + (w - 1)).alias("end")
    )

    # gaps-and-islands: a new island starts where this span begins after
    # the running max end of all earlier spans (+1 keeps adjacency merged)
    by_p = Window.partitionBy(id_col).orderBy("p")
    prev_max_end = F.max("end").over(
        by_p.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = flagged.withColumn(
        "_new",
        F.when(
            prev_max_end.isNull() | (F.col("p") > prev_max_end + 1), 1
        ).otherwise(0),
    ).withColumn(
        "_isl",
        F.sum("_new").over(by_p.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        spans.groupBy(id_col, "n_tokens", "_isl")
        .agg((F.max("end") - F.min("p") + 1).alias("_cov"))
        .groupBy(id_col, "n_tokens")
        .agg(F.sum("_cov").alias("n_covered"))
        .select(id_col, F.col("n_tokens").cast("long").alias("n_tokens"),
                F.col("n_covered").cast("long").alias("n_covered"))
    )
