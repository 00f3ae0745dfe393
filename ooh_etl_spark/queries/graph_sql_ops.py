"""Fourteenth coverage wave: graph propagation and modern-SQL parity —
one PageRank iteration over the customer→supplier purchase graph, a
correlated LATERAL top-k (the SQL-standard form of per-group top-k,
planned by Catalyst as a decorrelated window), and market-basket part
co-occurrence (the support-counting core of a recommender).

Scale notes: the PageRank edge list reduces to distinct (src, dst)
before any rank math; LATERAL decorrelates to one window pass (no
per-row re-scan of orders); basket pair generation is a self-join on
o_orderkey whose fan-out is quadratic only in per-order line count
(bounded small), never in table size."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ooh_etl_spark.queries.registry import register
from ooh_etl_spark.tables import load_table, load_tables

_LAT_K = 2


@register(
    "q115_lateral_topk",
    f"""
    SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT {_LAT_K}) t
    WHERE c.c_custkey < 40
    ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
    """,
)
def q115_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the SQL-standard spelling of
    per-group top-k, executed through the SQL-text API so Catalyst's
    lateral-join decorrelation is what actually plans it (it rewrites
    to the same window + filter as q16/top_k_per_group rather than
    re-running the subquery per outer row — the property that makes
    LATERAL safe at 10^9 outer rows). Identical SQL text runs on both
    engines."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    return spark.sql(
        f"""
        SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT {_LAT_K}) t
        WHERE c.c_custkey < 40
        ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
        """
    )


_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 in exact integer form


@register(
    "q116_pagerank_step",
    f"""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         outdeg AS (
      SELECT src, count(*) AS deg FROM edges GROUP BY src),
         contrib AS (
      -- initial rank 1.0 for every src; contribution = rank/deg in
      -- exact micro-units
      SELECT e.dst, CAST(round(1000000.0 / d.deg) AS BIGINT) AS c_u
      FROM edges e JOIN outdeg d USING (src))
    SELECT dst AS supplier,
           CAST(150000 + floor({_DAMP_NUM} * sum(c_u) / {_DAMP_DEN}.0) AS BIGINT)
             AS rank_u
    FROM contrib
    GROUP BY dst
    ORDER BY rank_u DESC, supplier
    """,
)
def q116_pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank iteration over the customer→supplier purchase
    graph (edge = some order by customer c contained a line from
    supplier s): rank' = 0.15 + 0.85 * sum(rank/outdeg) with uniform
    initial ranks, in exact integer micro-units (damping applied as
    85/100 integer arithmetic AFTER the sum, so no float crosses a
    row boundary). The edge list is DISTINCT-reduced before any math;
    out-degrees reuse the edge shuffle's partitioning; iterating feeds
    rank_u back in place of the constant — the q49 label-propagation
    loop structure. Citation: Page et al., 'The PageRank Citation
    Ranking' (1999)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    contrib = edges.join(outdeg, "src").select(
        "dst", F.round(1000000.0 / F.col("deg")).cast("bigint").alias("c_u")
    )
    return (
        contrib.groupBy(F.col("dst").alias("supplier"))
        .agg(
            (F.lit(150000) + F.floor(_DAMP_NUM * F.sum("c_u") / float(_DAMP_DEN)))
            .cast("bigint")
            .alias("rank_u")
        )
        .orderBy(F.col("rank_u").desc(), "supplier")
    )


_BASKET_TOP = 10


@register(
    "q117_market_basket",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT part_a, part_b, count(*) AS support
    FROM pairs
    GROUP BY part_a, part_b
    ORDER BY support DESC, part_a, part_b
    LIMIT {_BASKET_TOP}
    """,
)
def q117_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs appearing in the
    same order (the support-counting step of Apriori / recommender
    candidate generation). The self-join is keyed on o_orderkey, so
    the pair fan-out is quadratic in LINES PER ORDER (a small bounded
    constant) and linear in order count; the a<b predicate halves it
    and canonicalizes pair identity. DISTINCT first so duplicate part
    lines within an order can't inflate support."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    pairs = a.join(b, "k").filter(F.col("part_a") < F.col("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(_BASKET_TOP)
    )
