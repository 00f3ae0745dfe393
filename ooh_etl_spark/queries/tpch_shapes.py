"""Fourth coverage wave: the remaining classic TPC-H join shapes
(Q8 market share, Q17 correlated-avg, Q18 having-in, Q20 nested
semi-join, Q21 sole-supplier exists/not-exists) plus the BPE-ish
token-count oracle.

The reference has no joins or aggregation at all (SURVEY.md §2.A,
"Categories with NO reference implementation"); these are §2.B
extension shapes chosen because each exercises a distinct decorrelation
/ join-planning strategy that matters at 100 TB:

- Q8: two roles of one dimension + conditional aggregation — the share
  numerator folds into the same partial agg as the denominator (one
  shuffle, not two).
- Q17: correlated scalar AVG subquery → decorrelated into a partial agg
  joined back on the correlation key.
- Q18: HAVING over a fact-key agg, then join back to the dimension
  side — the agg output is tiny, so it broadcasts.
- Q20: nested IN-subqueries → a chain of semi-joins over a shared agg.
- Q21: EXISTS/NOT EXISTS on the same fact → rewritten as a per-key
  distinct-count predicate (one shuffle instead of two join passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ooh_etl_spark.queries.registry import register
from ooh_etl_spark.tables import load_table, parallelize_rows

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q61_market_share",
    f"""
    WITH vol AS (
      SELECT year(o_orderdate) AS yr,
             sn.n_name AS supp_nation,
             {_REV} AS volume
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'),
         cents AS (
      SELECT yr,
             CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                          THEN CAST(round(volume * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS nc,
             CAST(sum(CAST(round(volume * 100) AS BIGINT)) AS BIGINT) AS tc
      FROM vol GROUP BY yr)
    SELECT yr,
           round(nc / 100.0, 2) AS nation_volume,
           round(tc / 100.0, 2) AS total_volume,
           round(CAST(nc AS DOUBLE) / tc, 4) AS mkt_share
    FROM cents ORDER BY yr
    """,
)
def q61_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's share of PROMO-part revenue sold into
    ASIA customers, per order year. Numerator and denominator come out
    of ONE aggregation (conditional sum), so the share costs a single
    shuffle on `yr`. Both sums are quantized to integer cents before
    the ratio so the 4-dp round cannot straddle an engine-specific
    float boundary (see q23/q34 precedent)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")

    cn = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cnk"))
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    c = cust.join(F.broadcast(cn), cust.c_nationkey == cn.cnk).select("c_custkey")
    s = supp.join(F.broadcast(sn), supp.s_nationkey == sn.snk).select(
        "s_suppkey", "supp_nation"
    )
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(c), orders.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(
            F.year("o_orderdate").alias("yr"),
            "supp_nation",
            F.expr(_REV).alias("volume"),
        )
    )
    vol_c = F.round(F.col("volume") * 100).cast("bigint")
    cents = vol.groupBy("yr").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", vol_c).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("nc"),
        F.sum(vol_c).cast("bigint").alias("tc"),
    )
    return cents.select(
        "yr",
        F.round(F.col("nc") / 100.0, 2).alias("nation_volume"),
        F.round(F.col("tc") / 100.0, 2).alias("total_volume"),
        F.round(F.col("nc").cast("double") / F.col("tc"), 4).alias("mkt_share"),
    ).orderBy("yr")


@register(
    "q62_small_qty_revenue",
    """
    WITH brand_li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#4'),
         thr AS (
      SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS t
      FROM brand_li GROUP BY l_partkey)
    SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0, 2)
             AS avg_yearly
    FROM brand_li JOIN thr ON l_partkey = pk
    WHERE l_quantity < t
    """,
)
def q62_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of below-average-quantity lineitems.
    The correlated scalar subquery (avg quantity *per part*) is
    decorrelated into a groupBy on the correlation key joined back to
    the fact. The brand filter is applied BEFORE the avg aggregation —
    legal because l_partkey functionally determines p_brand, and it
    shrinks the agg input ~25x. The threshold side is an aggregate of
    the fact (small output) → broadcast back. l_quantity is
    integer-valued in the fixtures, so 0.2*avg is bit-identical across
    engines and the `<` comparison is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    brand_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = brand_li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("t")
    )
    return (
        brand_li.join(F.broadcast(thr), brand_li.l_partkey == thr.pk)
        .filter(F.col("l_quantity") < F.col("t"))
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
                / 100.0
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q63_large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey AS ok, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice,
           CAST(total_qty AS BIGINT) AS total_qty
    FROM big JOIN orders ON o_orderkey = ok
             JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q63_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest orders. The HAVING
    aggregate runs on the fact first (one shuffle on l_orderkey); its
    output is a few dozen rows, so IT broadcasts into orders — the
    big-table-probes-small-table direction, not the reverse. Timestamp
    formatted to a string in both engines (cross-engine ts rendering)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.ok)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            F.col("total_qty").cast("bigint").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@register(
    "q64_excess_stock_suppliers",
    """
    WITH pq AS (
      SELECT l_suppkey AS sk, sum(l_quantity) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red %'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST((SELECT qty FROM pq WHERE sk = s_suppkey) AS BIGINT) AS red_qty
    FROM supplier
    WHERE s_suppkey IN (
      SELECT sk FROM pq WHERE qty > (SELECT 0.5 * avg(qty) FROM pq))
    ORDER BY s_suppkey
    """,
)
def q64_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers moving above-average volume of 'red'
    parts. The nested IN-subquery chain decorrelates into: one agg per
    supplier over the semi-filtered fact → a scalar global threshold
    (broadcast as a 1-row cross join, never collected to the driver) →
    a semi-join into supplier. pq is computed once and reused for the
    per-supplier quantity, the threshold, and the semi-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red %"))
    supp = load_table(spark, sf_dir, "supplier")
    pq = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thr = pq.agg((F.avg("qty") * 0.5).alias("cutoff"))
    keep = pq.join(F.broadcast(thr), F.lit(True)).filter(F.col("qty") > F.col("cutoff"))
    return (
        supp.join(F.broadcast(keep), supp.s_suppkey == keep.sk)
        .select("s_suppkey", "s_name", F.col("qty").cast("bigint").alias("red_qty"))
        .orderBy("s_suppkey")
    )


@register(
    "q65_sole_supplier_orders",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s_name, count(*) AS sole_orders
    FROM li a JOIN supplier ON s_suppkey = a.l_suppkey
    WHERE NOT EXISTS (
      SELECT 1 FROM li b
      WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)
    GROUP BY s_name
    ORDER BY sole_orders DESC, s_name
    """,
)
def q65_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: orders served by exactly one supplier, counted
    per supplier. The NOT-EXISTS-over-the-same-fact is rewritten as a
    per-order distinct-supplier aggregate filtered to count 1 — one
    shuffle on the order key instead of a second self-join pass (the
    anti-join rewrite Catalyst would pick costs shuffle+join; the agg
    form is strictly cheaper and equivalent because EXISTS of `another
    supplier in this order` == distinct-count > 1)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    sole = (
        li.groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.min("l_suppkey").alias("only_supp"),
        )
        .filter(F.col("n_supp") == 1)
    )
    return (
        sole.join(F.broadcast(supp), sole.only_supp == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("sole_orders"))
        .orderBy(F.col("sole_orders").desc(), "s_name")
    )


@register(
    "q66_bpe_token_count",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens,
           len(list_distinct(regexp_extract_all(text, '\w+|[^\w\s]')))
             AS n_distinct_bpe
    FROM documents
    """,
)
def q66_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting with a cross-engine oracle: words,
    numbers, and individual punctuation marks count as separate tokens
    via `\\w+|[^\\w\\s]` — the match-based formulation (regexp_extract_all)
    instead of the lookaround split in functions.text.bpe_ish_tokens,
    because DuckDB's RE2 has no lookarounds. Narrow per-row expression,
    shuffle-free."""
    docs = parallelize_rows(load_table(spark, sf_dir, "documents"))
    toks = F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_bpe"),
    )
