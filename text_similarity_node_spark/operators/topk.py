"""Skew-aware per-group top-k.

The naive per-group top-k — ``row_number() OVER (PARTITION BY g ORDER BY
v)`` then ``rn <= k`` — shuffles EVERY row of a group to one task and
sorts it there; with low group cardinality or a hot group (the usual
corpus shape: a handful of languages/sources, one of them 100x the rest)
that single task owns the whole group at any cluster size.  The fix is
the same salting idea the LSH band join uses (operators/lsh.py), applied
to an aggregation: a deterministic salt splits each group into
``salt_buckets`` sub-groups, a first window pass keeps top-k per
sub-group (parallelism x salt_buckets, and the sort is over 1/buckets of
the rows), and a second pass over the <= k * salt_buckets survivors per
group picks the global top-k.  Correctness: any row in a group's true
top-k is also in the top-k of whichever sub-group it landed in, so pass
one never discards a winner.

Both passes are plain window functions — whole-stage JVM, no UDF — and
the second pass input is microscopic (k * salt_buckets rows per group),
so its single-task-per-group cost is constant, not data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: list[str],
    descending: bool = True,
    salt_buckets: int = 32,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` (ties broken by
    ``tiebreak_cols`` ascending — required: a total order makes the
    result deterministic and oracle-checkable).  Returns the input
    columns plus ``rn`` (1-based rank within the group)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if not tiebreak_cols:
        raise ValueError("tiebreak_cols required for a total order")
    key = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [key, *[F.col(c).asc() for c in tiebreak_cols]]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in tiebreak_cols]), F.lit(salt_buckets)
    ).alias("_salt")
    w_local = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    w_final = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w_local))
        .filter(F.col("_rn") <= k)
        .withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= k)
        .drop("_salt", "_rn")
    )
