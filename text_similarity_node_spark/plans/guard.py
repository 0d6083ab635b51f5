"""Physical-plan guardrails as a library surface.

The repo-level scale gate (``plan_audit.py``) sweeps every driver query
and fails on ``CartesianProduct``; this module makes the same checks a
first-class API so a user composing THEIR OWN query out of the engine's
operators can assert the plan shape before pointing it at 10^12 rows —
the Spark analog of the reference's "validate config before running the
kernel" posture (index.js exposes config validation up front).

Design note: inspection happens on the FINAL adaptive plan when the
caller has already executed the frame, otherwise on the initial physical
plan — AQE can only ever remove exchanges (broadcast conversion, skew
splitting), so a pre-execution pass that already satisfies the guard is
sufficient, while counts from a pre-execution pass may be conservative.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanStats:
    """Operator counts over the physical plan's textual form."""

    shuffles: int
    broadcasts: int
    cartesian_products: int
    broadcast_nl_joins: int
    python_evals: int

    @property
    def distributed_joins_only(self) -> bool:
        return self.cartesian_products == 0


def _plan_text(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(qe, "simple")


def plan_stats(df: DataFrame) -> PlanStats:
    """Count the scale-relevant physical operators in ``df``'s plan."""
    plan = _plan_text(df)
    return PlanStats(
        shuffles=plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        broadcasts=plan.count("BroadcastExchange"),
        cartesian_products=plan.count("CartesianProduct"),
        broadcast_nl_joins=plan.count("BroadcastNestedLoopJoin"),
        python_evals=plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython"),
    )


class UnscalablePlanError(RuntimeError):
    """The plan contains an operator that cannot survive a scale-up."""


def assert_scalable_plan(
    df: DataFrame,
    max_shuffles: int | None = None,
    allow_bnlj: bool = False,
    allow_row_python: bool = True,
) -> PlanStats:
    """Raise :class:`UnscalablePlanError` if ``df``'s physical plan
    contains a ``CartesianProduct`` (always fatal: quadratic in the
    input, no partition strategy saves it), an unannounced
    ``BroadcastNestedLoopJoin`` (fatal unless ``allow_bnlj``: one side
    must fit in every executor AND the join work is still all-pairs),
    row-at-a-time Python (``BatchEvalPython``) when
    ``allow_row_python=False``, or more shuffles than ``max_shuffles``.
    Returns the measured :class:`PlanStats` on success so callers can
    log them into their metrics ledger."""
    stats = plan_stats(df)
    if stats.cartesian_products:
        raise UnscalablePlanError(
            f"{stats.cartesian_products}x CartesianProduct in the physical "
            "plan: quadratic in the input — add an equi-join key "
            "(bands, blocks, fingerprints) or a broadcastable side"
        )
    if stats.broadcast_nl_joins and not allow_bnlj:
        raise UnscalablePlanError(
            f"{stats.broadcast_nl_joins}x BroadcastNestedLoopJoin: all-pairs "
            "against a broadcast side — acceptable only when that side is "
            "provably tiny; pass allow_bnlj=True to acknowledge"
        )
    plan = _plan_text(df)
    if not allow_row_python and plan.count("BatchEvalPython"):
        raise UnscalablePlanError(
            "row-at-a-time Python UDF (BatchEvalPython) in the hot path — "
            "use an Arrow-batched pandas UDF or a JVM expression"
        )
    if max_shuffles is not None and stats.shuffles > max_shuffles:
        raise UnscalablePlanError(
            f"{stats.shuffles} shuffles > budget {max_shuffles}: every "
            "exchange is a full rewrite of the data at scale — check for "
            "redundant repartitioning or non-broadcast small sides"
        )
    return stats
