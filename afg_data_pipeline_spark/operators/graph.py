"""Connected components over an edge list — the cluster-resolution
step of near-duplicate detection (pair list -> duplicate groups ->
one canonical doc per group).

Iterative min-label propagation: every vertex starts labeled with
itself; each round, every vertex takes the minimum label in its
closed neighborhood; fixpoint = components labeled by their minimum
vertex id. Rounds needed = graph diameter, and near-dup graphs are
shallow (clusters, not paths), so convergence is fast in practice;
``max_iter`` bounds the pathological chain.

Scale notes:
- Each round is one equi-join on vertex id + one min-aggregate —
  both shuffle on the same key, so AQE reuses the partitioning.
- The label frame is localCheckpoint()ed every round: iterative
  plans otherwise stack joins into an ever-deeper lineage that
  grows the optimizer's work quadratically and breaks past ~20
  rounds.
- Convergence is detected from sum(label), a single scalar
  aggregate per round: labels only ever decrease, so an unchanged
  sum IS the fixpoint — no expensive frame-vs-frame anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve undirected edges into components.

    Returns (vertex, component) where component is the minimum
    vertex id reachable from ``vertex``. Vertices are whatever ids
    appear in the edge list; isolated vertices (no edges) are the
    caller's concern — they are their own component trivially.
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(max_iter):
        msgs = sym.join(
            labels, sym.a == labels.vertex
        ).select(F.col("b").alias("vertex"), "component")
        labels = (
            labels.unionByName(msgs)
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(
            F.sum("component").alias("s")
        ).collect()[0]["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def canonical_per_component(
    members: DataFrame,
    id_col: str = "vertex",
    component_col: str = "component",
) -> DataFrame:
    """One keeper per component: the minimum id (which, under
    min-label propagation, is the component label itself)."""
    return members.groupBy(component_col).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_members"),
    )
