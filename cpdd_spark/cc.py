"""Connected components over the verified-pair edge list (P10).

Generalizes the reference's first-match-wins transitive grouping
(/root/reference/src/cpdd/matching.c:320-375): cpdd links every duplicate to
one canonical reference file; with fuzzy edges the duplicate relation is no
longer transitive by construction, so we take the transitive closure
explicitly — each component's minimum conv_id becomes the canonical
``cluster_id`` (same "min key is the link target" convention as the exact
tier).

Algorithm: iterative min-label propagation WITH pointer jumping. Each round
(1) every vertex adopts the minimum label in its closed neighborhood (one
hop), then (2) labels are shortcut through themselves — label(v) :=
label(label(v)) — so label chains halve every round and convergence is
O(log diameter) rounds rather than O(diameter), the same doubling idea as
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14). Each round is two shuffles (neighbor agg +
jump join); ``localCheckpoint`` truncates the growing lineage so the plan
doesn't deepen across iterations — the iterative-join analogue of the
reference's crash-safe stage boundaries (copy.c:28-67).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """``edges(a, b)`` [+ optional ``vertices(conv_id)``] ->
    ``clusters(conv_id, cluster_id)``.

    Vertices absent from ``edges`` (singletons) keep themselves as
    cluster_id when ``vertices`` is supplied.
    """
    spark = edges.sparkSession
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("src").alias("conv_id")).distinct()
    labels = nodes.withColumn("label", F.col("conv_id")).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # (1) one-hop: adopt the min label in the closed neighborhood
        nbr_min = (
            sym.join(labels, sym["src"] == labels["conv_id"])
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(
            nbr_min, labels["conv_id"] == nbr_min["dst"], "left"
        ).select(
            "conv_id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # (2) pointer jump: label(v) := label(label(v)) — every label is
        # itself a vertex, so the mapping join is total where it matters
        lmap = stepped.select(
            F.col("conv_id").alias("pj_id"), F.col("label").alias("pj_label")
        )
        jumped = (
            stepped.join(lmap, stepped["label"] == lmap["pj_id"], "left")
            .select(
                "conv_id",
                F.coalesce(F.col("pj_label"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "conv_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = jumped
        if n_changed == 0:
            break

    clusters = labels.withColumnRenamed("label", "cluster_id")
    if vertices is not None:
        singles = (
            vertices.select("conv_id")
            .join(clusters, "conv_id", "left_anti")
            .withColumn("cluster_id", F.col("conv_id"))
        )
        clusters = clusters.unionByName(singles)
    return clusters
