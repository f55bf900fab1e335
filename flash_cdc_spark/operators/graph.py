"""Connected components over near-dup pair graphs — the step that turns
pairwise matches into dedup *clusters* (each cluster keeps one canonical
document).

Algorithm: iterative min-label propagation (each node repeatedly adopts
the minimum label among itself and its neighbors) until fixpoint — the
standard large-graph CC formulation on Spark (what GraphFrames/GraphX
run under the hood, expressed with joins so it needs no extra library).

Scale notes:
- per iteration: one join edges⋈labels + one groupBy — both shuffle on
  node id; iterations ≈ graph diameter (near-dup graphs are unions of
  small cliques → a handful of rounds);
- ``localCheckpoint`` after each round truncates the lineage, keeping
  plan size constant over iterations (the classic iterative-Spark trap);
- convergence is checked with a changed-count aggregate, not a fixed
  round count, so results are exact (required for the recursive-CTE
  oracle to match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Return ``(node, cluster_id)`` where ``cluster_id`` is the minimum
    node id of the component. ``edges`` is undirected input (one row per
    pair, either orientation)."""
    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    rev = edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    und = fwd.unionByName(rev).distinct().localCheckpoint(eager=True)

    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        neighbor_min = (
            und.join(labels, und.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))
