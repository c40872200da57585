"""Connected components over near-duplicate edges: pairwise matches ->
duplicate GROUPS (then one canonical survivor per group).

The dedup ladder's last step: MinHash/SimHash/Jaccard produce pairs,
but transitive matches (A~B, B~C) must collapse into one group even
when A!~C. That's a connected-components problem, solved here with
iterative hash-min label propagation on DataFrames:

  label(v) <- min(label(v), min over neighbors u of label(u))

repeated until a fixed point. Converges in O(component diameter)
iterations -- near-dup clusters are shallow (dup groups, not social
graphs), so typically <5. Each iteration is one shuffle on the node
id; ``localCheckpoint`` truncates the growing lineage so iteration N
doesn't replay iterations 1..N-1. For adversarial graphs with long
chains, the large-star/small-star algorithm halves diameter per round;
this implementation exposes ``max_iter`` and fails loudly rather than
silently returning partial components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    pass


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component is the
    smallest node id reachable from it."""
    e = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    )
    # Undirected: keep both directions once.
    bidir = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct().localCheckpoint()

    labels = (
        bidir.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # Neighbor labels flow along edges; keep the min per node.
        msgs = bidir.join(
            labels.withColumnRenamed("id", "s"), "s"
        ).select(F.col("d").alias("id"), "comp")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise ConvergenceError(
        f"components did not converge in {max_iter} iterations"
    )


def dedup_groups(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-group summary: (component, group_size, keeper_id).
    keeper_id = smallest member = the canonical document to retain."""
    comps = connected_components(edges, src, dst, max_iter)
    return comps.groupBy("comp").agg(
        F.count("*").cast("long").alias("group_size"),
        F.min("id").alias("keeper_id"),
    ).select(F.col("comp").alias("component"), "group_size", "keeper_id")
