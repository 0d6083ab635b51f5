"""Bounded-interval range join: left points matched to right intervals
[lo, hi) with a known bound on interval width — the second time-series
primitive (after asof.py) Spark's DataFrame API lacks a scale-safe shape
for.

A naive ``l.val >= r.lo AND l.val < r.hi`` predicate is a theta-join:
Catalyst can only plan it as BroadcastNestedLoop (or a cartesian product
per key), which is |L|x|R| work.  With a width bound W (every interval
satisfies hi - lo <= W), bucketing the range dimension by W turns it into
an EQUI-join: a point in bucket b can only fall inside intervals starting
in buckets b-1 or b, so the right side replicates each interval to its
<= 2 covering buckets (explode of a 2-element sequence — bounded fan-out),
the join key is (.., bucket), and the exact inequality filters the final
pairs.  One shuffle, broadcast-able small side, no quadratic blowup —
the standard interval-bucketing trick (cf. Spark's own range-join hints
in Databricks runtime, DuckDB's IEJoin literature).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    max_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of left rows to right rows with
    ``right.lo <= left.val < right.hi`` (and equality on ``keys``).

    ``left_val``/``right_lo``/``right_hi`` are integer-typed columns (cast
    timestamps to epoch micros upstream); every interval must satisfy
    ``hi - lo <= max_width`` — wider intervals raise at runtime via a
    filter-side assertion column rather than silently dropping pairs.
    Output: all left columns + all right columns (names must not clash
    apart from ``keys``)."""
    keys = keys or []
    w = int(max_width)
    l_tagged = left.withColumn("_bk", (F.col(left_val) / w).cast("long"))
    # the width contract is asserted INSIDE the bucket expression (an
    # unused side column would be pruned by Catalyst and never evaluated):
    # a too-wide interval raises instead of silently missing pairs
    hi_bucket = F.when(
        F.col(right_hi) - F.col(right_lo) > w,
        F.raise_error(F.lit("interval_join: interval wider than max_width")).cast("long"),
    ).otherwise((F.col(right_hi) / w).cast("long"))
    r_tagged = right.withColumn(
        "_bk",
        F.explode(
            F.sequence((F.col(right_lo) / w).cast("long"), hi_bucket)
        ),
    )
    joined = l_tagged.join(r_tagged, [*keys, "_bk"])
    return joined.filter(
        (F.col(right_lo) <= F.col(left_val))
        & (F.col(left_val) < F.col(right_hi))
    ).drop("_bk")
