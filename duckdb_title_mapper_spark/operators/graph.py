"""Connected components — the transitive-closure stage of near-dup
clustering (candidate pairs → dedup groups).

Banded LSH (``dedup.py``, ``workload.x_near_dup_clusters``) emits *pairs*;
a dedup pipeline needs the transitive groups ("A≈B and B≈C ⇒ one keeper
for {A,B,C}").  That closure is inherently iterative — no single SQL pass
computes it — so this is one of the few operators where driver-side
iteration is the honest Spark shape: min-label propagation, each round a
join + groupBy (all Catalyst), converging in O(graph diameter) rounds.
At 100 TB this is the standard large-scale CC recipe (alternating-star
variants improve the constant; diameters of near-dup graphs are tiny).

The declared query's DuckDB oracle is a recursive CTE propagating labels
to a fixpoint — slower asymptotically, but exact, which is the point.
"""

from __future__ import annotations


def connected_components(edges_df, src: str = "src", dst: str = "dst",
                         max_iter: int = 25):
    """(vertex, component) for the undirected graph in ``edges_df``;
    component id = min vertex id in the component.  Deterministic."""
    from pyspark.sql import functions as F

    from ..plans.materialize import materialize as _mat, release as _release

    edges = _mat(
        edges_df.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges_df.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize ONCE: the edge relation (often an expensive LSH
        # candidate-pair subplan) is consumed every round — without this
        # each iteration re-runs the whole upstream pipeline
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    changed = -1
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        # materialize BEFORE the convergence probe so the probe joins two
        # materialized relations instead of re-deriving new_labels (also
        # cuts the otherwise-exponential lineage growth per round)
        new_labels = _mat(
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        if labels is not new_labels:
            _release(labels)  # retire last round's materialization
        labels = new_labels
        if changed == 0:
            break
    else:
        # labels would be silently wrong on a graph with diameter >
        # max_iter; convergence is already measured each round, so a
        # non-converged exit must be loud, not a plausible result
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
    return labels.select(F.col("id").alias("vertex"), F.col("label").alias("component"))
