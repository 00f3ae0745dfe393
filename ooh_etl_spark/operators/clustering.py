"""K-means as an iterated DataFrame operator.

One Lloyd iteration is the q102 shape (assign to nearest centroid via
a K-row broadcast, re-reduce); ``kmeans_fit`` drives it to a fixed
iteration count, feeding each round's centroid means back in as the
next broadcast. The loop lives on the driver but touches only
K x dim floats per round — the data never leaves executors, and each
round is one shuffle (the groupBy on assignment). Same iterative
structure as operators/graph.py label propagation (checkpoint-free
here: the lineage is depth-``iters`` and each round's centroid table
is collected to the driver anyway, truncating it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: vectors (vec_id, e) x centroids
    (cid, ce) -> (vec_id, e, cid, dist). K-row broadcast; ties break on
    the lowest cid for determinism."""
    diff2 = F.zip_with(F.col("e"), F.col("ce"), lambda a, b: (a - b) * (a - b))
    d = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "e",
        "cid",
        F.aggregate(diff2, F.lit(0.0), lambda s, x: s + x).alias("dist"),
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return d.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).drop("rk")


def kmeans_fit(
    vectors: DataFrame, k: int, iters: int = 3
) -> tuple[DataFrame, list[float]]:
    """Run ``iters`` Lloyd iterations over ``vectors`` (vec_id,
    e: array<double>). Seeds = the first k vectors by vec_id (the
    deterministic choice; k-means++ would sample). Returns the final
    assignment DataFrame (vec_id, cid, dist) and the per-iteration
    inertia history (sum of squared distances — monotonically
    non-increasing, the Lloyd convergence guarantee).
    """
    dims = len(vectors.select("e").first()[0])
    centroids = (
        vectors.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").cast("int").alias("cid"), F.col("e").alias("ce"))
    )
    history: list[float] = []
    assigned = None
    for _ in range(iters):
        assigned = _assign(vectors, centroids)
        history.append(assigned.agg(F.sum("dist")).collect()[0][0])
        # new centroid j = per-dimension mean of members: decomposable
        # into sum-vector + count, one groupBy — no collect of members.
        sums = assigned.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at("e", i + 1)).alias(f"s{i}")
                for i in range(dims)
            ],
        )
        centroids = sums.select(
            "cid",
            F.array(
                *[F.col(f"s{i}") / F.col("n") for i in range(dims)]
            ).alias("ce"),
        )
    return assigned.select("vec_id", "cid", "dist"), history
