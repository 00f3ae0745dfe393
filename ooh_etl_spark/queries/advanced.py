"""Second wave of relational coverage: grouping sets, percentiles,
unpivot, outer/cross joins, date arithmetic, null-handling functions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ooh_etl_spark.queries.registry import register
from ooh_etl_spark.tables import load_table, register_views


@register(
    "q38_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q38_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping sets via the SQL surface (rollup/cube's
    general form; same partial+final hash aggregation underneath).
    The cents sum is CAST to DOUBLE before the divide: in Spark SQL a
    ``100.0`` literal is DECIMAL and bigint/decimal division yields
    DECIMAL (stringifying as ``x.000000``), while DuckDB yields DOUBLE
    — the cast makes both engines divide in double."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
                 AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q39_percentiles",
    """
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5)  AS p50,
           quantile_disc(l_extendedprice, 0.95) AS p95,
           min(l_extendedprice) AS lo,
           max(l_extendedprice) AS hi
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q39_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (values drawn from the data — the
    continuous/interpolated form lands midpoints exactly on the .005
    rounding lattice of 2-dp money, where engines round apart). The
    approximate path for 100 TB is ``percentile_approx`` — see q39b."""
    li = load_table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_returnflag")
    disc = lambda p: F.expr(  # noqa: E731
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY l_extendedprice)"
    )
    return grouped.agg(
        disc(0.5).alias("p50"),
        disc(0.95).alias("p95"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )


@register("q39b_approx_percentiles", None)  # sketch-based → rows-only
def q39b_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest approximate percentiles (percentile_approx) — the
    sketch path for 100 TB where exact sort-based percentiles are
    impractical. Rows-only; bounded error vs q39 asserted in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("p50_approx"),
    )


@register(
    "q40_unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def q40_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt). Spark's unpivot/stack is a narrow
    per-row expansion — no shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    ).withColumn(
        "measure", F.regexp_replace("measure", "^l_", "")
    )


@register(
    "q41_full_outer_nations",
    """
    SELECT n_name, c_cnt, s_cnt FROM (
      SELECT coalesce(cn.n_nationkey, sn.n_nationkey) AS nk,
             coalesce(cn.c_cnt, 0) AS c_cnt, coalesce(sn.s_cnt, 0) AS s_cnt
      FROM (SELECT c_nationkey AS n_nationkey, count(*) AS c_cnt
            FROM customer GROUP BY 1) cn
      FULL OUTER JOIN
           (SELECT s_nationkey AS n_nationkey, count(*) AS s_cnt
            FROM supplier GROUP BY 1) sn
      USING (n_nationkey))
    JOIN nation ON nk = n_nationkey
    """,
)
def q41_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with coalesced keys — both unmatched sides
    survive; the shape that breaks naive broadcast plans (outer side
    must shuffle)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = cust.groupBy(F.col("c_nationkey").alias("n_nationkey")).agg(
        F.count(F.lit(1)).alias("c_cnt")
    )
    sn = supp.groupBy(F.col("s_nationkey").alias("n_nationkey")).agg(
        F.count(F.lit(1)).alias("s_cnt")
    )
    fo = cn.join(sn, "n_nationkey", "full_outer").select(
        F.col("n_nationkey").alias("nk"),
        F.coalesce("c_cnt", F.lit(0)).alias("c_cnt"),
        F.coalesce("s_cnt", F.lit(0)).alias("s_cnt"),
    )
    return fo.join(
        F.broadcast(nation), fo.nk == nation.n_nationkey
    ).select("n_name", "c_cnt", "s_cnt")


@register(
    "q42_cross_join_regions",
    """
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_name <> b.r_name
    """,
)
def q42_cross_join_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian on a tiny dimension (the only place a cross
    join is ever acceptable)."""
    region = load_table(spark, sf_dir, "region")
    a = region.select(F.col("r_name").alias("from_region"))
    b = region.select(F.col("r_name").alias("to_region"))
    return a.crossJoin(b).filter(F.col("from_region") != F.col("to_region"))


@register(
    "q43_date_arithmetic",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL '3 months', '%Y-%m-%d')  AS plus_3m,
           strftime(last_day(o_orderdate), '%Y-%m-%d')              AS month_end,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01')    AS days_to_y2k,
           dayofweek(o_orderdate) + 1                               AS dow,
           week(o_orderdate)                                        AS wk
    FROM orders WHERE o_orderkey < 200
    """,
)
def q43_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time arithmetic surface: datediff, date_add, months_between,
    trunc — per-row expressions, formatted to strings for the
    cross-engine compare."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return orders.select(
        "o_orderkey",
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus_3m"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), "o_orderdate").alias(
            "days_to_y2k"
        ),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("wk"),
    )


@register(
    "q44_null_handling",
    """
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 0) END AS bal_pos,
           ifnull(CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 0) END, -1)
             AS bal_filled,
           greatest(round(c_acctbal, 0), 5000.0) AS at_least_5k,
           least(round(c_acctbal, 0), 5000.0)    AS at_most_5k
    FROM customer
    """,
)
def q44_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics surface: coalesce, nullif, nvl2, null-safe
    equality (<=>), IS DISTINCT FROM — the totality toolkit ANSI mode
    demands."""
    cust = load_table(spark, sf_dir, "customer")
    bal_pos = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.round("c_acctbal", 0)
    )
    return cust.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        bal_pos.alias("bal_pos"),
        F.coalesce(bal_pos, F.lit(-1)).alias("bal_filled"),
        F.greatest(F.round("c_acctbal", 0), F.lit(5000.0)).alias("at_least_5k"),
        F.least(F.round("c_acctbal", 0), F.lit(5000.0)).alias("at_most_5k"),
    )


@register(
    "q45_array_functions",
    """
    WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    SELECT p_partkey,
           array_to_string(list_sort(words), '|')                AS sorted_words,
           array_to_string(list_reverse(list_sort(words)), '|')  AS rev_words,
           array_to_string(list_sort(words), '-')                AS joined,
           words[1]                                              AS first_word,
           len(list_filter(words, w -> length(w) > 4))           AS n_long
    FROM t
    """,
)
def q45_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface: split, array_sort, reverse, array_join,
    element access, higher-order filter — expression-level fan-out
    inside the scan stage. Array-valued intermediates are serialized
    with array_join for the output (the harness canonicalizer hashes
    scalar columns; raw array columns are unhashable pandas-side), so
    the array semantics are still what's under test — just rendered."""
    part = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return part.select(
        "p_partkey",
        F.array_join(F.array_sort(words), "|").alias("sorted_words"),
        F.array_join(F.reverse(F.array_sort(words)), "|").alias("rev_words"),
        F.array_join(F.array_sort(words), "-").alias("joined"),
        words.getItem(0).alias("first_word"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long"),
    )


# --- q337: relational pivot (round 6) --------------------------------------
_PIVOT_SEGS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

_DUCK_PIVOT = f"""
    WITH j AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS seg,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS rev_c
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey)
    SELECT nation,
           {", ".join(
               f"CAST(coalesce(sum(CASE WHEN seg = '{s}' THEN rev_c END), 0)"
               f" AS BIGINT) AS {s.lower()}_c"
               for s in _PIVOT_SEGS)}
    FROM j GROUP BY nation ORDER BY nation
"""


@register("q337_pivot_segment_matrix", _DUCK_PIVOT)
def q337_pivot_segment_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The relational PIVOT surface — ``groupBy().pivot(col, values)``
    with an EXPLICIT value list (q40's unpivot inverse, closing the
    reshape pair): nation x market-segment revenue matrix in integer
    cents. The explicit list matters twice: it keeps the schema static
    (no extra distinct-values job, no data-dependent columns — the
    production contract for a pivot feeding a downstream table) and it
    makes the oracle a plain CASE aggregation.

    100 TB shape: Catalyst compiles pivot-with-values to ONE aggregate
    whose buffer holds |values| slots per group — identical cost to
    the manual max(when()) spelling (q288), same single shuffle; the
    dims broadcast. Omitting the value list adds a distinct pass —
    the anti-pattern the explicit list exists to avoid."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    j = (
        orders.join(
            F.broadcast(
                cust.select("c_custkey", "c_nationkey", "c_mktsegment")
            ),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("rev_c"),
        )
    )
    wide = (
        j.groupBy("nation")
        .pivot("seg", list(_PIVOT_SEGS))
        .agg(F.sum("rev_c"))
    )
    return wide.select(
        "nation",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("bigint").alias(f"{s.lower()}_c")
            for s in _PIVOT_SEGS
        ],
    ).orderBy("nation")
