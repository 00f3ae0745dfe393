"""Third coverage wave: embedding-cosine near-dup, correlated-min
(TPC-H Q2 shape), bi-national volume (Q7 shape), IVF-style ANN."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ooh_etl_spark.operators.similarity import cosine
from ooh_etl_spark.queries.registry import register
from ooh_etl_spark.tables import load_table, parallelize_rows


@register(
    "q50_embedding_near_dup",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                 4) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                4) >= 0.4
    """,
)
def q50_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the semantic-dedup
    operator (BASELINE.json:6). Brute-force pair scan with one side
    broadcast; beyond ~10^4 vectors per side the LSH/IVF paths
    (q31/q53) provide candidate generation instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = parallelize_rows(emb).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    cos = F.round(cosine(F.col("va"), F.col("vb")), 4)
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= 0.4)
        .select("id_a", "id_b", "cos_sim")
    )


@register(
    "q51_cheapest_supplier_per_part",
    """
    SELECT p_partkey, p_name, s_suppkey, s_acctbal FROM (
      SELECT p_partkey, p_name, s_suppkey, s_acctbal,
             row_number() OVER (PARTITION BY p_partkey
                                ORDER BY s_acctbal, s_suppkey) AS rn
      FROM lineitem JOIN part ON l_partkey = p_partkey
                    JOIN supplier ON l_suppkey = s_suppkey
      WHERE p_size < 15)
    WHERE rn = 1
    """,
)
def q51_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated minimum decorrelated into a ranking
    window (Catalyst's own strategy for correlated scalar subqueries)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    supp = load_table(spark, sf_dir, "supplier")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).join(
        F.broadcast(supp), li.l_suppkey == supp.s_suppkey
    )
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_acctbal")
    )


@register(
    "q52_nation_volume",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l_shipdate) AS yr,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) / 100.0 AS volume
    FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation cn ON c_nationkey = cn.n_nationkey
                  JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND cn.n_name IN ('NATION_3', 'NATION_8')
      AND sn.n_name IN ('NATION_3', 'NATION_8')
    GROUP BY 1, 2, 3
    """,
)
def q52_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: fact-fact join on the order key, dimensions
    broadcast, two roles of the same dimension (nation) aliased."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.filter(F.col("n_name").isin("NATION_3", "NATION_8")).select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.filter(F.col("n_name").isin("NATION_3", "NATION_8")).select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    c = cust.join(F.broadcast(cn), cust.c_nationkey == cn.cnk)
    s = supp.join(F.broadcast(sn), supp.s_nationkey == sn.snk)
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(c, orders.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
    )
    from ooh_etl_spark.functions.money import cents_sum

    return j.groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("yr")).agg(
        cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")
    )


@register("q53_ann_ivf", None)  # approximate (cell-restricted) → rows-only
def q53_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest
    centroid (deterministic centroid set = the first 16 vectors), then
    search only within the query's cell. The 100 TB pattern: the
    centroid table broadcasts, assignment is a narrow per-row argmax,
    and the fine search shuffles only (cell, vector) co-partitions.
    Recall vs exact top-k is asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = F.broadcast(
        emb.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
        )
    )

    def assign(df: DataFrame, id_out: str, v_out: str) -> DataFrame:
        scored = df.select(
            F.col("vec_id").alias(id_out), F.col("embedding").alias(v_out)
        ).join(cents, F.lit(True))
        w = Window.partitionBy(id_out).orderBy(
            F.desc(cosine(F.col(v_out), F.col("cv"))), F.col("cent_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_out, v_out, F.col("cent_id").alias("cell"))
        )

    corpus = assign(parallelize_rows(emb), "neighbor_id", "cvec")
    queries = assign(emb.filter(F.col("vec_id") < 5), "query_id", "qvec")
    scored = queries.join(corpus, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(cosine(F.col("qvec"), F.col("cvec"))), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 4).alias("cos_sim"),
            "rank",
        )
    )
