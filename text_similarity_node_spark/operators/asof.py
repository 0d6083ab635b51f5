"""As-of join: each left row matched to the latest right row at-or-before
its timestamp, per key — the time-series primitive Spark's DataFrame API
lacks (named in kdb/QuestDB/DuckDB as ASOF JOIN).

Distributed shape: NOT a range join (an inequality theta-join explodes to
|L|x|R| per key before filtering).  Instead the classic union-sort-carry
construction: tag both sides, union, ONE shuffle on the key, sort each key
partition by (ts, side), and carry the last-seen right payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.  Cost is
one shuffle + one in-partition sort of |L|+|R| rows — the same plan a
hand-written kdb-style engine executes, expressed entirely in Catalyst
window operators (whole-stage codegen, no UDF).

Skew note: a hot key concentrates its rows on one reducer, like any window
over partitionBy.  For hot keys, pre-bucket by coarse time range and run
the join per (key, bucket) with per-bucket seed rows — not needed at the
registered audit scale, documented here for the 100-TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance: None = None,
) -> DataFrame:
    """Left as-of join (``left.ts >= right.ts``, equal timestamps match).

    ``right`` must be unique per (key, ts) — dedupe upstream (the q46
    derivation aggregates max(o_orderkey) per (custkey, orderdate)), or
    which duplicate wins is engine-defined.  Payload columns come back
    null when no right row is at-or-before the left row (LEFT semantics).
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*lcols).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            l_tagged.schema["_lrow"].dataType
        ).alias("_lrow"),
        *payload_cols,
    )
    u = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at equal ts (_is_left 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row — the >=
    # convention ASOF JOIN implementations share.
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "_is_left",
        "_lrow",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in lcols], *payload_cols
    )
