"""Exact set-similarity join via prefix filtering (no false negatives).

The deterministic complement to MinHash-LSH (which is probabilistic): for a
Jaccard threshold t, order each record's distinct tokens by global frequency
(rarest first — the canonical ordering from the prefix-filter literature:
Chaudhuri et al. SSJoin, Bayardo et al. All-Pairs, Xiao et al. PPJoin); a
pair with jaccard >= t MUST share at least one token in each record's first
``|tokens| - ceil(t * |tokens|) + 1`` tokens.  Joining on prefix tokens is
therefore candidate-complete; the exact kernel then verifies.

This is the engine's exact-recall scale path: the prefix join touches only
rare tokens (frequency ordering makes prefixes selective), and the length
filter |y| >= t*|x| prunes before the verify.

Implementation is pure DataFrame ops: token explode -> global frequency ->
per-record rank -> prefix explode -> equi-join on token -> verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import columns as C


def prefix_filter_jaccard_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """df(id, tokens array<string>) -> pairs(id1, id2, jaccard) with
    set-Jaccard >= threshold.  Exact (recall 1.0 by construction).

    ``group_cols`` (optional) restricts pairs to records sharing those
    columns (a partitioned similarity join, e.g. same-language only): the
    group keys join into both the frequency table and the candidate
    equi-join, so cross-group candidates are never generated and token
    frequencies — hence prefix selectivity — are per-group."""
    groups = list(group_cols or [])
    toks = df.select(
        F.col(id_col).alias("rid"),
        *groups,
        F.array_distinct(F.col(tokens_col)).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    # Materialize once: the plan below references `toks` four times (flat /
    # both verify sides) and the prefix subtree twice (candidate self-join);
    # without a cut Spark recomputes the tokenize+rank pipeline per branch
    # (measured 34 s -> ~13 s at sf0.1).  persist, not localCheckpoint:
    # checkpointing writes partitions to executor disk and the write
    # serializes on shared-disk hardware; the ContextCleaner unpersists
    # the blocks when the plan is GC'd, so there is no storage leak.
    toks = toks.persist()

    flat = toks.select("rid", "sz", *groups, F.explode("toks").alias("tok"))
    freq = flat.groupBy("tok", *groups).agg(F.count(F.lit(1)).alias("df"))
    # canonical order: rarest token first, tie-broken by token value
    # (per-group frequencies — pairs never cross groups, so the ordering
    # only needs to be consistent within a group)
    ranked = (
        flat.join(freq, ["tok", *groups])
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("rid").orderBy(F.col("df").asc(), F.col("tok").asc())
            ),
        )
    )
    # prefix length = sz - ceil(t*sz) + 1
    prefix = ranked.filter(
        F.col("rank") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("rid", "sz", *groups, "tok")
    # second cut: the self-join would otherwise evaluate freq+window twice
    prefix = prefix.persist()

    a, b = prefix.alias("a"), prefix.alias("b")
    join_cond = (
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.rid") < F.col("b.rid"))
        # length filter: |y| in [t*|x|, |x|/t] is necessary for jac >= t
        & (F.col("b.sz") >= F.ceil(F.lit(threshold) * F.col("a.sz")))
        & (F.col("a.sz") >= F.ceil(F.lit(threshold) * F.col("b.sz")))
    )
    for g in groups:
        join_cond = join_cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    cand = (
        a.join(b, join_cond)
        .select(F.col("a.rid").alias("id1"), F.col("b.rid").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )

    t1 = toks.select(F.col("rid").alias("id1"), F.col("toks").alias("toks1"))
    t2 = toks.select(F.col("rid").alias("id2"), F.col("toks").alias("toks2"))
    verified = (
        cand.join(t1, "id1")
        .join(t2, "id2")
        .withColumn("jaccard", C.set_jaccard(F.col("toks1"), F.col("toks2")))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
    return verified
