"""Similarity search over embedding columns (ArrayType(FloatType)).

BASELINE.json:6 mandates ANN over embeddings. Two tiers:

- ``knn_brute_force``: exact top-k cosine. The query set is broadcast;
  the corpus is scanned once (narrow), scored per-row with JVM
  higher-order functions, and ranked with one shuffle on query id.
  Right answer when |queries| is small — even at 100 TB of corpus.
- ``lsh_ann_pairs``: BucketedRandomProjectionLSH bucket join — the
  scale path when BOTH sides are large (corpus×corpus linkage).

Dot products run in double precision (float arrays are upcast) so
scores are stable and match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _to_double(a), _to_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def knn_brute_force(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries (small) is broadcast; scoring is a per-row expression over
    the corpus scan; ranking shuffles only (query_id, score) pairs.

    r13 opt: both sides pre-cast to double and carry their l2 norm as
    a per-ROW column, so each scored pair evaluates one
    zip_with+aggregate dot and a scalar divide instead of re-deriving
    two casts and two norms per pair (HOF lambdas are interpreted —
    CodegenFallback — so array passes per pair are the cost driver).
    The float sequence is bit-identical: same fold order, same
    |q|*|c| product order as cosine().
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            _to_double(F.col(vec_col)).alias("q_vec"),
        ).withColumn(
            "qn",
            F.expr("sqrt(aggregate(q_vec, CAST(0 AS DOUBLE),"
                   " (acc, x) -> acc + x * x))"),
        )
    )
    from ooh_etl_spark.tables import parallelize_rows

    c = parallelize_rows(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("c_vec"),
    ).withColumn(
        "cn",
        F.expr("sqrt(aggregate(c_vec, CAST(0 AS DOUBLE),"
               " (acc, x) -> acc + x * x))"),
    )
    scored = (
        c.join(q, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.expr("aggregate(zip_with(q_vec, c_vec, (x, y) -> x * y),"
                   " CAST(0 AS DOUBLE), (acc, v) -> acc + v) / (qn * cn)"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos_sim"), "rank")
    )


def lsh_ann_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 1.0,
    bucket_length: float = 2.0,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate neighbor pairs via random-projection LSH (euclidean).

    Bucket join: only vectors sharing a hash bucket are compared — the
    corpus×corpus path where brute force is quadratic."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    prep = lambda df, label: df.select(  # noqa: E731
        F.col(id_col).alias(label), array_to_vector(_to_double(F.col(vec_col))).alias("v")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="h", bucketLength=bucket_length,
        numHashTables=num_tables, seed=42,
    )
    cf = prep(corpus, "corpus_id")
    model = brp.fit(cf)
    pairs = model.approxSimilarityJoin(prep(queries, "query_id"), cf, threshold, "dist")
    return pairs.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.corpus_id").alias("neighbor_id"),
        F.round("dist", 4).alias("l2_dist"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
