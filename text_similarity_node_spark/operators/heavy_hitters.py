"""Exact top-k frequent items via a Misra-Gries candidate pass.

The naive top-k over a 100 TB token stream is ``groupBy(token).count()``:
map-side combine reduces each partition to its DISTINCT tokens, but a web
corpus's vocabulary is heavy-tailed — hundreds of millions of distinct
tokens per shard — so the shuffle still carries the whole tail to pay for
a 30-row answer.

This operator makes the shuffle O(partitions * k') instead:

  pass A  per-partition Misra-Gries summaries (Misra & Gries 1982; the
          "frequent" algorithm): k' counters, decrement-all on overflow.
          MG guarantee per partition p: any item with local frequency
          f_p > n_p / k' survives with counter >= f_p - n_p / k'.
          Fan-in: at most k' rows per partition leave the executors.

  union   an item with GLOBAL frequency f > N / k' satisfies
          sum_p f_p > sum_p n_p / k', hence f_p > n_p / k' in at least
          one partition — so the union of per-partition survivor sets
          contains every global heavy hitter.  (No per-item count math
          across partitions is needed; the union alone is the superset.)

  pass B  exact recount of ONLY the candidate items: a broadcast semi-join
          pushes the candidate filter into the scan, and the groupBy that
          follows aggregates a vocabulary of <= partitions * k' items.

  audit   the result is provably the exact top-k iff the k-th exact count
          is > N / k' (otherwise an item below the MG floor could belong
          in the top-k).  The operator computes that predicate and falls
          back to the full groupBy when it fails — correct always, cheap
          when the head is heavy (the web-corpus case, Zipf head >> N/k').

Two Spark jobs (pass A is consumed by an aggregate before pass B is
planned), but each touches the corpus once with no wide shuffle of the
tail.  Deterministic: MG's survivor SET is order-dependent in general, but
pass B recounts exactly, and the fallback predicate is computed from exact
counts — the emitted top-k is the exact one regardless of partition order.

Reference ground: vocabulary/frequency analysis sits next to the
reference's token_based kernels as corpus diagnostics (SURVEY.md §2's
text-analysis block); the sketch is public-domain streaming machinery.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mg_fold(counters: dict, batch_counts, k_counters: int) -> dict:
    """Fold one batch's exact (item, count) pairs into a bounded
    Misra-Gries summary with the mergeable-summaries merge (Agarwal et
    al., PODS 2012): add, then if more than k' counters remain, subtract
    the (k'+1)-th largest value from all and drop the non-positive.

    Invariant (the guarantee pass B relies on): for every item, the
    summary undercounts its true frequency-so-far by at most
    total_so_far / (k_counters + 1) — so any item with frequency above
    that floor has a positive counter and survives.  Pure function;
    property-tested directly in tests/test_heavy_hitters.py."""
    for it, c in batch_counts:
        counters[it] = counters.get(it, 0) + int(c)
    if len(counters) > k_counters:
        vals = sorted(counters.values(), reverse=True)
        cut = vals[k_counters]  # (k'+1)-th largest
        counters = {it: c - cut for it, c in counters.items() if c > cut}
    return counters


def mg_candidates(items: DataFrame, item_col: str, k_counters: int) -> DataFrame:
    """One column of items -> distinct candidate items (the union of
    per-partition Misra-Gries survivor sets).  Output is at most
    ``numPartitions * k_counters`` rows.

    Vectorized MG: each Arrow batch is reduced with pandas
    ``value_counts`` (C loop over the batch), and the per-batch exact
    counts are folded into the bounded summary with the mergeable-MG
    merge (Agarwal et al., "Mergeable Summaries", PODS 2012): add, then
    if more than k' counters remain, subtract the (k'+1)-th largest
    value from all and drop the non-positive.  The merge preserves the
    MG bound (undercount <= n_p / (k'+1)), and no Python statement runs
    per token — only per distinct-item-per-batch."""
    schema = T.StructType([T.StructField("item", T.StringType())])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf[item_col].dropna().value_counts()
            counters = mg_fold(counters, vc.items(), k_counters)
        yield pd.DataFrame({"item": list(counters.keys())})

    return (
        items.select(F.col(item_col))
        .mapInPandas(part, schema=schema)
        .select(F.col("item").alias(item_col))
        .distinct()
    )


def exact_topk(
    items: DataFrame,
    item_col: str,
    k: int,
    k_counters: int = 4096,
) -> DataFrame:
    """Exact top-k items by frequency (count desc, item asc tie-break),
    computed through the MG candidate pass when sound, full groupBy
    otherwise.  Returns (item, n) with n the exact global count."""
    items = items.persist()
    total = items.count()

    cand = mg_candidates(items, item_col, k_counters)
    counted = (
        items.join(F.broadcast(cand), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col(item_col).asc())
        .limit(k)
    )
    rows = counted.collect()
    floor = total / float(k_counters)
    if len(rows) == k and rows[-1]["n"] > floor:
        # sound: nothing outside the candidate set can beat the k-th count
        spark = items.sparkSession
        return spark.createDataFrame(rows, schema=f"{item_col} string, n bigint")
    # fallback: head too light for this k' — full exact aggregation
    return (
        items.groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col(item_col).asc())
        .limit(k)
    )
