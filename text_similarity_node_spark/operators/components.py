"""Connected components over the verified-pair edge list.

Iterative min-label propagation expressed as DataFrame self-joins
(SURVEY.md §7.6; GraphFrames deliberately not used — external dep).  The
algorithm is the classic "hash-min": every vertex repeatedly adopts the
minimum label in its closed neighborhood until a fixpoint.

Scale discipline (SURVEY.md §4 'Iteration at scale'):
* lineage is cut every ``checkpoint_every`` iterations with
  ``localCheckpoint`` (or a durable checkpoint dir when the caller passes a
  catalog) — Catalyst cannot optimize across iterations and an uncut plan
  grows exponentially;
* convergence test is a cheap aggregate (count of label changes), not a
  collect of labels;
* edges are symmetrized once up front; each iteration is one shuffle on
  vertex id.

For graphs with very long chains, hash-min needs O(diameter) iterations;
near-duplicate clusters are dense and shallow in practice (diameter <= 3-4),
so the loop converges in a handful of passes.  ``max_iterations`` bounds
pathological inputs; hitting it raises (never silently wrong clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    pass


def connected_components(
    edges: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iterations: int = 50,
    checkpoint_every: int = 1,
) -> DataFrame:
    """edges(id1, id2) -> labels(clip_id, cluster_id).

    cluster_id is the minimum member id of each component (deterministic,
    stable across runs).  Vertices present only as singletons are NOT
    emitted — callers union in singletons if needed.
    """
    spark = edges.sparkSession
    sym = (
        edges.select(F.col(id1).alias("src"), F.col(id2).alias("dst"))
        .unionByName(edges.select(F.col(id2).alias("src"), F.col(id1).alias("dst")))
        .distinct()
    )
    # initial label: min neighbor (including self)
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.min("dst"), F.min("src")).alias("label"))
        .withColumnRenamed("src", "vid")
    )
    labels = labels.localCheckpoint(eager=True)

    for it in range(max_iterations):
        # propagate: candidate label for dst = min(label[src]) over in-edges
        prop = (
            sym.join(labels, sym.src == labels.vid)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("dst", "vid2")
        )
        new_labels = (
            labels.join(prop, labels.vid == prop.vid2, "left")
            .select(
                "vid",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "changed"
                ),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            return labels.select(
                F.col("vid").alias("clip_id"), F.col("label").alias("cluster_id")
            )
    raise ConvergenceError(
        f"connected_components did not converge in {max_iterations} iterations"
    )
