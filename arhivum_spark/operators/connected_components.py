"""Connected components over an edge list via iterative min-label propagation.

Replaces the reference's greedy O(n^2) transitive grouping with a
processed-set (CodeProjectDuplicateDetectionService.java:48-95) — that loop
IS small-scale connected components; here it's the distributed version:

    label(v) <- min(label(v), min_{(u,v) in E} label(u))

iterated to fixpoint. Each iteration is one join + one aggregation;
`localCheckpoint()` truncates lineage per iteration (north rule:
checkpointed lineage). Convergence is O(component diameter); our candidate
edges are hub-stars (operators/lsh.py), so diameters are small constants.
For adversarial long-chain graphs switch to large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
— same primitives, O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Label propagation exhausted max_iters with labels still changing.

    Returning the partial labels silently would hand the caller WRONG
    components (a chain longer than max_iters hops from its min vertex is
    the failure mode); raising makes non-convergence impossible to miss.
    """


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iters: int = 50,
    id_col: str = "id",
) -> DataFrame:
    """vertices(id), edges(src,dst) -> (id, component) with component =
    min vertex id reachable. Vertices absent from edges keep component=id.

    Output is restricted to `vertices`: edge endpoints outside it still
    PROPAGATE labels (so an out-of-vertex node can bridge two vertices)
    but are not emitted.

    Raises ConvergenceError if max_iters rounds pass with labels still
    changing (component diameter > max_iters — e.g. an adversarial chain);
    callers needing guaranteed O(log n) rounds on such graphs should raise
    max_iters or pre-contract the graph (large-star/small-star, SoCC'14).
    """
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # Only vertices incident to an edge can ever change labels; isolated
    # vertices (the vast majority in a dedup graph) are appended afterwards
    # with component = their own id. The loop then iterates over the edge
    # endpoint set, not the full vertex set.
    touched = sym.select(F.col("a").alias(id_col)).distinct()
    isolated = vertices.join(touched, id_col, "left_anti").select(
        F.col(id_col), F.col(id_col).alias("component")
    )
    labels = touched.select(
        F.col(id_col).alias("v"), F.col(id_col).alias("component")
    ).localCheckpoint()
    n_changed = 0
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym.a == labels.v)
            .groupBy(F.col("b").alias("v2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.v == neighbor_min.v2, "left")
            .select(
                "v",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("_changed"),
            )
        ).localCheckpoint()
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    if n_changed != 0:
        raise ConvergenceError(
            f"connected_components did not converge in {max_iters} "
            f"iterations ({n_changed} labels still changing); component "
            "diameter exceeds max_iters — raise cc_max_iters or contract "
            "the graph first"
        )
    emitted = labels.select(F.col("v").alias(id_col), "component").join(
        vertices.select(id_col), id_col, "left_semi"
    )
    return emitted.unionByName(isolated)
