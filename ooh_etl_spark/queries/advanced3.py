"""Fourth coverage wave: statistical aggregates, arg-extrema, ordered
string aggregation, RANGE window frames."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ooh_etl_spark.queries.registry import register
from ooh_etl_spark.tables import load_table


@register(
    "q54_stat_aggregates",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)               AS sd_qty,
           round(var_samp(l_quantity), 4)                  AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
           round(covar_samp(l_discount, l_tax), 6) + 0.0   AS covar_disc_tax,
           round(skewness(l_quantity), 4) + 0.0            AS skew_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q54_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: stddev/variance (sample +
    population), corr, covar, skewness — one pass, all decomposable
    into moment sums."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + 0.0).alias("corr_qty_price"),
        (F.round(F.covar_samp("l_discount", "l_tax"), 6) + 0.0).alias("covar_disc_tax"),
        # + 0.0 folds IEEE negative zero to positive zero (round(-1e-9, 4)
        # yields -0.0 in one engine and 0.0 in the other).
        (F.round(F.skewness("l_quantity"), 4) + 0.0).alias("skew_qty"),
    )


@register(
    "q55_arg_extrema",
    """
    SELECT o_orderpriority,
           (max(struct_pack(p := o_totalprice, k := o_orderkey))).k
             AS biggest_order,
           (min(struct_pack(p := o_totalprice, k := o_orderkey))).k
             AS smallest_order,
           max(o_totalprice) AS max_price,
           min(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q55_arg_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregation with a DETERMINISTIC tie-break: max/min over
    a (price, orderkey) struct — lexicographic in both engines — picks
    the extreme price and, among ties, the extreme key. Plain
    max_by/arg_max is engine-arbitrary on ties; unique prices at the
    stock SFs masked that until the 5x-replicated scaling corpus (5
    copies of every extreme price under different keys) flipped the
    two engines to different keys (round-8 full-registry 5x sweep).
    The struct-extremum form is the same one aggregate pass (map-side
    combinable) with the tie-break carried in the comparator."""
    orders = load_table(spark, sf_dir, "orders")
    pk = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return orders.groupBy("o_orderpriority").agg(
        F.max(pk)["k"].alias("biggest_order"),
        F.min(pk)["k"].alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@register(
    "q56_string_agg",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q56_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect → sort → join keeps the
    result deterministic regardless of partitioning)."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "q59_merge_upsert",
    """
    WITH updates AS (
      SELECT c_custkey, c_name, c_nationkey,
             round(c_acctbal + 100.0, 2) AS c_acctbal,
             'UPGRADED' AS c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0)
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey % 10 <> 0
    UNION ALL
    SELECT * FROM updates
    """,
)
def q59_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (anti-join + union): every 10th customer
    gets an updated balance and segment; the rest pass through."""
    from ooh_etl_spark.operators.relational import merge_upsert

    cust = load_table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        F.lit("UPGRADED").alias("c_mktsegment"),
    )
    return merge_upsert(cust, updates, "c_custkey")


@register(
    "q58_above_customer_average",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders i
                                WHERE i.o_custkey = o.o_custkey)
    """,
)
def q58_above_customer_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery, decorrelated into a window
    average — one shuffle on the correlation key instead of a
    re-executed subquery per row."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q60_map_functions",
    """
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE doc_id < 100),
         wc AS (
      SELECT doc_id,
             list_filter(list_transform(list_distinct(toks),
                         w -> {'k': w, 'v': len(list_filter(toks, x -> x = w))}),
                         e -> e.v > 1) AS ents
      FROM t)
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_transform(ents, e -> e.k || '=' || (e.v * 2))), '|'), '')
             AS doubled_repeats,
           len(ents) AS n_repeated
    FROM wc
    """,
)
def q60_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions (map_filter / transform_values /
    map_entries) over the word-count map — the reference's dict-valued
    fields (§1.2) manipulated in place, canonicalized for comparison."""
    from ooh_etl_spark.queries.flagship import word_count_map

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    wc = word_count_map(F.col("text"))
    repeats = F.map_filter(wc, lambda k, v: v > 1)
    doubled = F.transform_values(repeats, lambda k, v: v * 2)
    as_string = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(doubled),
                lambda e: F.concat(e.getField("key"), F.lit("="), e.getField("value").cast("string")),
            )
        ),
        "|",
    )
    return docs.select(
        "doc_id",
        as_string.alias("doubled_repeats"),
        F.size(F.map_keys(repeats)).alias("n_repeated"),
    )


@register(
    "q57_range_frame",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_suppkey
             ORDER BY epoch(l_shipdate)
             RANGE BETWEEN 432000 PRECEDING AND 432000 FOLLOWING), 2)
             AS revenue_pm5d
    FROM lineitem
    WHERE l_suppkey < 3
    """,
)
def q57_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame over event time (±5 days of shipments per
    supplier) — value-based frames, not row-count frames."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 3)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.unix_timestamp("l_shipdate"))
        .rangeBetween(-432000, 432000)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w), 2).alias("revenue_pm5d"),
    )


_DUCK_COLLATE = """
    WITH messy AS (
      SELECT CASE p_partkey % 3
               WHEN 0 THEN p_type
               WHEN 1 THEN lower(p_type)
               ELSE concat(substr(p_type, 1, 1), lower(substr(p_type, 2)))
             END AS category,
             p_retailprice
      FROM part)
    SELECT min(category) AS category, count(*) AS n,
           sum(CAST(round(p_retailprice * 100) AS BIGINT)) / 100.0
             AS total_price
    FROM messy
    GROUP BY lower(category)
    ORDER BY category
"""


@register("q179_collation_group", _DUCK_COLLATE)
def q179_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation support: a messy feed where the same category
    arrives as UPPER, lower, and Capitalized (synthesized 3-way by key
    mod — the real-world multi-source ingest problem) grouped under the
    UTF8_LCASE collation via F.collate — the engine-level answer that
    keeps comparisons, joins and aggregations case-insensitive WITHOUT
    rewriting every expression in lower(). The reported representative
    is min(category) under BINARY ordering (deterministic; the collated
    grouping key itself is an arbitrary group member, so it never
    reaches the output), which the oracle mirrors with GROUP BY
    lower(). Money rides integer cents as everywhere.

    100 TB shape: collation is metadata on the comparison, not a
    projection — the groupBy shuffles the original bytes with the
    lowercase-fold applied inside the hash/compare, same exchange
    volume as a binary groupBy, and map-side partials still apply."""
    p = load_table(spark, sf_dir, "part")
    first = F.substring(F.col("p_type"), 1, 1)
    rest = F.expr("substring(p_type, 2)")
    messy = p.select(
        F.when(F.col("p_partkey") % 3 == 0, F.col("p_type"))
        .when(F.col("p_partkey") % 3 == 1, F.lower(F.col("p_type")))
        .otherwise(F.concat(first, F.lower(rest)))
        .alias("category"),
        "p_retailprice",
    )
    from ooh_etl_spark.functions.money import cents_sum

    return (
        messy.groupBy(F.collate(F.col("category"), "UTF8_LCASE").alias("k"))
        .agg(
            F.min("category").alias("category"),
            F.count(F.lit(1)).alias("n"),
            cents_sum("p_retailprice").alias("total_price"),
        )
        .select("category", "n", "total_price")
        .orderBy("category")
    )


_3VL_SQL = """
WITH holders AS (
  SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer WHERE c_acctbal > 9000)
SELECT
 (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM holders))
   AS not_in_cnt,
 (SELECT count(*) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM holders h WHERE h.k = o.o_custkey))
   AS not_exists_cnt,
 (SELECT count(*) FROM holders WHERE k IS NULL) AS null_keys
"""


@register("q182_three_valued_logic", _3VL_SQL)
def q182_three_valued_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, run as the IDENTICAL SQL text on both
    engines (the q67/q171 contract): with even one NULL in the
    subquery, ``x NOT IN (...)`` is never TRUE under three-valued
    logic — x <> NULL is UNKNOWN — so the count is 0, while the
    NOT EXISTS form (NULL-safe by construction: the correlated
    predicate just never matches) counts 13k+ orders. The third column
    pins that the subquery really contains NULLs, guarding the test
    against a fixture regeneration quietly removing them.

    Engine mechanics worth the parity check: Spark compiles the NOT IN
    into a null-aware anti join (NullAwareHashedRelation — a broadcast
    with an extra null-key probe), a join mode that exists ONLY for
    this semantic; a plain left-anti join would silently compute the
    NOT EXISTS answer. At 100 TB the practical advice in the docstring
    is the point: NOT EXISTS (or an explicit IS NOT NULL guard) keeps
    the anti join null-unaware and cheaper."""
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_3VL_SQL)


_DUCK_TRAIL = """
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
             AS BIGINT) AS trail_c
    FROM events WHERE user_id < 200
"""


@register("q183_trailing_hour_sum", _DUCK_TRAIL)
def q183_trailing_hour_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per user, the rolling sum of the
    TRAILING HOUR of activity — RANGE BETWEEN INTERVAL '1 hour'
    PRECEDING AND CURRENT ROW over the event timestamp. This is the
    value-based frame q57 demonstrated on numbers, on TIME: the frame
    holds however many events fall in the hour (0..n), which no ROWS
    frame can express. Money rides integer cents, so the in-frame sum
    is order-free and engine-exact.

    100 TB shape: one shuffle on user_id, per-partition sort by ts —
    the same exchange a session window costs; frame evaluation is a
    sliding two-pointer over the sorted run (linear, no re-scan per
    row). The streaming twin of this exact shape is q34's sliding
    window; this form answers it point-in-time per event rather than
    per pane."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT user_id, date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s,
               sum(CAST(round(value * 100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
                 AS trail_c
        FROM events WHERE user_id < 200
        """
    )


_DUCK_SKYLINE = """
    WITH pts AS (
      SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
             p_size AS sz, count(*) AS support
      FROM part GROUP BY 1, 2),
         w AS (
      SELECT price_c, sz, support,
             min(sz) OVER (ORDER BY price_c, sz
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS msb
      FROM pts)
    SELECT price_c / 100.0 AS price, sz AS size, support
    FROM w WHERE msb IS NULL OR msb > sz
    ORDER BY price_c, sz
"""


@register("q190_skyline", _DUCK_SKYLINE)
def q190_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline / Pareto frontier (Borzsonyi, Kossmann & Stocker,
    ICDE'01): the parts no other part beats on BOTH price and size —
    the multi-objective 'best offers' query. The naive form is an
    O(n^2) dominance anti-join; this plan reduces it to DISTINCT
    points + ONE running-min window: sorted by (price, size), a point
    is dominated iff some earlier point's size <= its size (earlier in
    that order implies price <= with at least one strict coordinate on
    distinct points — tie-safety is exactly why the window runs on the
    DISTINCT point set). Machine-checked equal to the naive dominance
    SQL in pytest; the oracle runs the same window form.

    100 TB shape: the groupBy collapses the corpus to |distinct
    (price, size)| points (with support counts riding along — the q166
    canonicalization trick); the global window then touches only that
    reduced set. When even the distinct set is huge, skylines COMPOSE:
    skyline(S) = skyline(union of per-partition skylines), so the
    scale path is a local skyline per range partition followed by this
    exact operator over the (tiny) union — the docstring contract for
    the 2-phase form."""
    p = load_table(spark, sf_dir, "part")
    pts = p.groupBy(
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_c"),
        F.col("p_size").alias("sz"),
    ).agg(F.count(F.lit(1)).alias("support"))
    from pyspark.sql import Window

    w = Window.orderBy("price_c", "sz").rowsBetween(Window.unboundedPreceding, -1)
    return (
        pts.withColumn("msb", F.min("sz").over(w))
        .filter(F.col("msb").isNull() | (F.col("msb") > F.col("sz")))
        .select(
            (F.col("price_c") / 100.0).alias("price"),
            F.col("sz").alias("size"),
            "support",
        )
        .orderBy("price", "size")
    )
