"""Scale-safe twins of the global-window queries.

q72/q139 (ntile quantile binning) and q149 (gaps-and-islands) are
written over a GLOBAL ``Window.orderBy`` — correct and oracle-exact,
but ``WindowExec: No Partition Defined`` routes every row through one
partition, so they are the first queries to die at 100× scale. This
module holds the forms that survive:

- q72b/q139b: bucket boundaries from ``percentile_approx`` (a
  mergeable t-digest-style sketch aggregated in one distributed pass),
  then a per-row CASE assignment — no sort, no single partition.
  Bucket populations are approximately equal rather than exactly
  ntile-equal, so they carry the driver's rows-only check plus a
  band-tolerance pytest against the exact twin.
- q149b: the islands merge trick — run gaps-and-islands PER ID RANGE
  (partitioned window), then merge islands that touch across range
  boundaries with a second pass over the island set, which is orders
  of magnitude smaller than the row set. Output is IDENTICAL to
  q149's, so it shares q149's exact oracle (machine-checked equal,
  the q27/q73 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ooh_etl_spark.queries.registry import QUERIES, register
from ooh_etl_spark.tables import load_table


def _approx_equi_depth(
    spark: SparkSession, sf_dir: str, n_buckets: int, bucket_col: str
) -> DataFrame:
    """Equi-depth binning without a global sort: boundary values from
    one ``percentile_approx`` aggregate (broadcast back as a 1-row
    frame), per-row bucket assignment via the boundary array."""
    orders = load_table(spark, sf_dir, "orders")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = orders.agg(
        F.percentile_approx("o_totalprice", qs, 100_000).alias("bounds")
    )
    withb = orders.crossJoin(F.broadcast(bounds))
    # bucket = 1 + number of boundaries strictly below the value
    bucket = F.lit(1) + F.size(
        F.filter(F.col("bounds"), lambda b: b < F.col("o_totalprice"))
    )
    return (
        withb.select(F.col("o_totalprice"), bucket.alias(bucket_col))
        .groupBy(bucket_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy(bucket_col)
    )


@register("q72b_price_quartiles_approx", None)  # approx boundaries → rows-only
def q72b_price_quartiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q72's 100 TB form: quartile bands from percentile_approx
    boundaries instead of a global ntile sort. One distributed sketch
    aggregate + one narrow per-row assignment; populations are within
    sketch tolerance of n/4 (asserted in tests/test_approx_twins.py)."""
    return _approx_equi_depth(spark, sf_dir, 4, "quartile")


@register("q139b_equi_depth_histogram_approx", None)  # approx → rows-only
def q139b_equi_depth_histogram_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q139's 100 TB form: 10-bucket equi-depth histogram from
    percentile_approx boundaries — the statistic ANALYZE TABLE actually
    computes at scale (exact ntile histograms don't survive a global
    sort of the fact table)."""
    return _approx_equi_depth(spark, sf_dir, 10, "bucket")


_RANGE = 1024  # ids per range partition in the q149b island merge


def q149b_id_gap_detection_ranged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q149's 100 TB form with IDENTICAL output (same oracle): islands
    computed per id-range with a PARTITIONED window, then islands that
    touch across range boundaries merged by a second gaps-and-islands
    pass over the island set itself. The global-ordered window runs
    over O(#islands) rows, not O(#rows) — islands compose across range
    boundaries, rows do not need to."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    w_rng = Window.partitionBy("rng").orderBy("event_id")
    c = ev.withColumn("rng", F.expr(f"event_id DIV {_RANGE}")).select(
        "event_id",
        "rng",
        (F.col("event_id") - F.row_number().over(w_rng)).alias("grp"),
    )
    islands0 = c.groupBy("rng", "grp").agg(
        F.min("event_id").alias("island_start"),
        F.max("event_id").alias("island_end"),
        F.count(F.lit(1)).alias("island_len"),
    )
    # Merge pass over the (small) island set: a new merged island
    # starts wherever this island does NOT touch the previous one.
    w_isl = Window.orderBy("island_start")
    prev_end = F.lag("island_end").over(w_isl)
    new_grp = F.when(
        prev_end.isNull() | (F.col("island_start") > prev_end + 1), 1
    ).otherwise(0)
    merged = (
        islands0.withColumn("new_grp", new_grp)
        .withColumn(
            "mgrp",
            F.sum("new_grp").over(
                w_isl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("mgrp")
        .agg(
            F.min("island_start").alias("island_start"),
            F.max("island_end").alias("island_end"),
            F.sum("island_len").alias("island_len"),
        )
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("island_len").cast("bigint").alias("n_present"),
        (F.max("island_end") - F.min("island_start") + 1 - F.sum("island_len"))
        .cast("bigint")
        .alias("n_missing"),
        F.max("island_len").cast("bigint").alias("longest_run"),
    )


# q149b shares q149's EXACT oracle (outputs are identical by
# construction), so it must register after stats_tests has — the
# queries/__init__ import order guarantees that.
register(
    "q149b_id_gap_detection_ranged",
    QUERIES["q149_id_gap_detection"].oracle,
)(q149b_id_gap_detection_ranged)
