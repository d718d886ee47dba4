"""Connected components over candidate-pair edges — the clustering step
of a dedup pipeline (near-dup similarity is pairwise, not transitive;
keeping one survivor per GROUP requires the transitive closure).

No reference analog (the reference's dedup is single-key
drop_duplicates, scripts/silver/transform_silver.py:232); this is the
scale-path extension that MinHash-LSH / Jaccard candidate pairs feed.

Algorithm: iterative min-label propagation. Each node starts labeled
with itself; every round each node takes the min of its own label and
its neighbors' labels; fixpoint = every node labeled with the min id
of its component. Rounds needed = graph diameter — small for dedup
graphs (duplicate clusters are dense blobs, not long paths), which is
why this beats the log-round large-star/small-star variant in
practice while staying two orders simpler.

Scale posture per round: one shuffle for the edge⋈label join (both
sides partitioned by the join key), one map-side-combinable min-agg,
and a ``localCheckpoint`` to TRUNCATE LINEAGE — without it the plan
doubles every round and Catalyst analysis time explodes by round ~10
(the classic iterative-DataFrame trap; checkpointing is what GraphFrames
does internally too). Convergence is detected with a count() on changed
labels — one tiny job per round against materialized partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    nodes: DataFrame | None = None,
    node_col: str = "node",
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id of its connected component.

    Returns (node, cluster_id). By default nodes are whatever appears
    as an edge endpoint, so isolated nodes (no edges) are absent by
    construction. Pass ``nodes`` (a DataFrame whose ``node_col`` is the
    full node universe) to get edge-less nodes back labeled with
    themselves — a singleton component each — instead of every caller
    re-implementing the union.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    e = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # materialize once; every round re-reads these partitions
    e = e.localCheckpoint(eager=True)

    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nbr_min = (
            e.join(
                labels.select(
                    F.col("node").alias("__n"), F.col("label").alias("__l")
                ),
                F.col("dst") == F.col("__n"),
            )
            .groupBy("src")
            .agg(F.min("__l").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr_min, F.col("node") == F.col("src"), "left")
            .select(
                "node",
                F.col("label").alias("__old"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = stepped.filter(F.col("label") < F.col("__old")).count()
        labels = stepped.select("node", "label")
        if n_changed == 0:
            break
    else:
        # silent partial convergence would split true components —
        # wrong dedup survivors with no signal. Fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({n_changed} labels still changing); the graph has a "
            f"component of diameter > {max_iter} — raise max_iter"
        )
    out = labels.select("node", F.col("label").alias("cluster_id"))
    if nodes is not None:
        universe = nodes.select(
            F.col(node_col).cast("long").alias("node")
        ).distinct()
        isolated = universe.join(out.select("node"), "node", "left_anti")
        out = out.unionByName(
            isolated.withColumn("cluster_id", F.col("node"))
        )
    return out
