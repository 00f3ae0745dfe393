"""Sixteenth coverage wave: BI finishing shapes — period-over-period
growth, Pareto/ABC classification, and an ordered multi-step funnel.
The report-layer queries a warehouse serves all day; each is one or
two shuffles over pre-reduced inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ooh_etl_spark.queries.registry import register
from ooh_etl_spark.tables import load_table


@register(
    "q127_mom_growth",
    """
    WITH m AS (
      SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS rev_c
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1999-01-01'
      GROUP BY yr, mo)
    SELECT yr, mo,
           round(rev_c / 100.0, 2) AS revenue,
           CAST(round(10000.0 * (rev_c - lag(rev_c) OVER w)
                      / lag(rev_c) OVER w) AS BIGINT) AS mom_growth_bp
    FROM m
    WINDOW w AS (ORDER BY yr, mo)
    ORDER BY yr, mo
    """,
)
def q127_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth in basis points (NULL for the
    first month) — the period-over-period shape every BI layer serves.
    The lag window runs over the 24-row MONTHLY aggregate, not the
    facts, so the unpartitioned window is a non-issue; growth is a
    ratio of integer cents."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    m = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("rev_c"))
    w = Window.orderBy("yr", "mo")
    prev = F.lag("rev_c").over(w)
    return m.select(
        "yr",
        "mo",
        F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
        F.round(10000.0 * (F.col("rev_c") - prev) / prev)
        .cast("bigint")
        .alias("mom_growth_bp"),
    ).orderBy("yr", "mo")


@register(
    "q128_pareto_abc",
    """
    WITH p AS (
      SELECT l_partkey,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
               AS rev_c
      FROM lineitem GROUP BY l_partkey),
         r AS (
      SELECT l_partkey, rev_c,
             sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum_c,
             sum(rev_c) OVER () AS tot_c
      FROM p),
         cls AS (
      SELECT CASE WHEN cum_c * 100 <= tot_c * 80 THEN 'A'
                  WHEN cum_c * 100 <= tot_c * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_c
      FROM r)
    SELECT abc_class,
           count(*) AS n_parts,
           CAST(sum(rev_c) AS BIGINT) AS class_rev_c
    FROM cls GROUP BY abc_class ORDER BY abc_class
    """,
)
def q128_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC inventory classification: parts ranked by revenue,
    classified A (first 80% of cumulative revenue), B (to 95%), C
    (tail). The running sum orders the PER-PART aggregate (one row per
    part — already reduced before the window); class boundaries are
    integer cross-products of cent sums, so the cut is engine-exact.
    At extreme part cardinality the same query runs per category
    (partitioned window) or over a revenue-threshold pre-filter."""
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
        .cast("bigint")
        .alias("rev_c")
    )
    wcum = Window.orderBy(F.col("rev_c").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy()
    r = p.select(
        "rev_c",
        F.sum("rev_c").over(wcum).alias("cum_c"),
        F.sum("rev_c").over(wtot).alias("tot_c"),
    )
    cls = F.when(F.col("cum_c") * 100 <= F.col("tot_c") * 80, "A").when(
        F.col("cum_c") * 100 <= F.col("tot_c") * 95, "B"
    ).otherwise("C")
    return (
        r.groupBy(cls.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev_c").cast("bigint").alias("class_rev_c"),
        )
        .orderBy("abc_class")
    )


@register(
    "q129_funnel_depth",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
         s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id),
         s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s1) AS n_signup,
           (SELECT count(*) FROM s2) AS n_then_click,
           (SELECT count(*) FROM s3) AS n_then_purchase
    """,
)
def q129_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (signup, then a LATER click, then a LATER
    purchase): each stage is a per-user min-timestamp reduce chained
    through a join on the previous stage — the strictly-ordered funnel
    without window scans over full history (q97's 2-step generalized).
    Every stage's output is one row per surviving user; at 10^9 users
    the chain is three reduce+join rounds, each smaller than the
    last."""
    ev = load_table(spark, sf_dir, "events")

    def stage(prev: DataFrame, t_prev: str, etype: str, t_out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(t_prev))
            .groupBy("user_id")
            .agg(F.min("ts").alias(t_out))
        )

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = stage(s1, "t1", "click", "t2")
    s3 = stage(s2, "t2", "purchase", "t3")
    c1 = s1.agg(F.count(F.lit(1)).alias("n_signup"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_then_click"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_then_purchase"))
    return c1.crossJoin(c2).crossJoin(c3)


@register(
    "q130_regex_gauntlet",
    """
    WITH x AS (
      SELECT doc_id,
             regexp_extract_all(text, '[a-z]*a[a-z]*') AS a_words,
             len(regexp_extract_all(text, 'ta')) AS n_ta,
             CASE WHEN regexp_matches(text, '^t') THEN 1 ELSE 0 END AS starts_t
      FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           len(a_words) AS n_a_words,
           array_to_string(a_words[1:3], ',') AS first3,
           n_ta,
           starts_t
    FROM x ORDER BY doc_id
    """,
)
def q130_regex_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface parity: regexp_extract_all (all matches, the
    reference's global-match idiom at index.js:59-79 generalized),
    match counting, and anchored matching — per-row expressions in one
    codegen stage. Both engines run identical RE2-compatible patterns;
    the slice-and-join canonicalizes the array for the hash compare."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    a_words = F.regexp_extract_all(F.col("text"), F.lit("[a-z]*a[a-z]*"), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(a_words).alias("n_a_words"),
        F.array_join(F.slice(a_words, 1, 3), ",").alias("first3"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("ta"), F.lit(0))).alias("n_ta"),
        F.when(F.col("text").rlike("^t"), 1).otherwise(0).alias("starts_t"),
    ).orderBy("doc_id")
