"""Iterative algorithms: connected components via min-label propagation.

The canonical dedup post-processing step: near-dup PAIRS (from Jaccard/
MinHash/SimHash) become CLUSTERS, so each group keeps one canonical
document. An iterative driver loop of joins — Spark's native shape for
fixpoint algorithms (each iteration is a distributed join + aggregate;
``localCheckpoint`` truncates the growing lineage so plan size stays
constant).

Convergence: min-label propagation needs O(component diameter)
iterations; near-dup clusters are shallow (diameter ≤ a few hops), and
the loop stops at the first unchanged iteration anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """(id, cluster) for every node in ``pairs``; cluster = min node id
    of the component."""
    # Materialize the edge list once — every iteration joins against it,
    # and without the checkpoint each join would re-derive the (possibly
    # expensive) upstream pair-generation pipeline.
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionByName(pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    # Min-label propagation monotonically decreases sum(label), so the
    # fixpoint test is one scalar aggregate, not a join.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        msgs = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "label"
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select("id", F.col("label").alias("cluster"))
