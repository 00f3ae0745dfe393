"""Similarity-search queries over ``embeddings`` (BASELINE.json:6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ooh_etl_spark.operators.similarity import knn_brute_force, lsh_ann_pairs
from ooh_etl_spark.queries.registry import register
from ooh_etl_spark.tables import load_table

_DUCK_KNN = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
               FROM embeddings),
         scored AS (
      SELECT query_id, neighbor_id,
             list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
      FROM q JOIN c ON query_id != neighbor_id)
    SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5
"""


@register("q30_knn_cosine", _DUCK_KNN)
def q30_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine: 5 query vectors BROADCAST against the corpus
    (scoring is a per-row fold in the scan stage), per-query top-5 via
    window — brute force is correct at fixed query-set size; the
    full-corpus path is q31/q53."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_brute_force(
        corpus=emb, queries=emb.filter(F.col("vec_id") < 5), k=5
    )


@register("q31_ann_lsh", None)  # random-projection LSH → rows-only
def q31_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: sign-bit buckets, candidates only
    within buckets — the sublinear path. Rows-only; recall vs q30's
    exact answer is asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_ann_pairs(
        corpus=emb, queries=emb.filter(F.col("vec_id") < 5), threshold=1.2
    )
