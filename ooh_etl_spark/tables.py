"""Catalog of the driver-generated parquet tables (TESTDATA.md).

``load_table`` is the single scan entry point for every query in the
engine: plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown, column pruning, and partition pruning (parquet row-group
stats) fully available. No caching here — at 100 TB you want the
vectorized reader + pushed filters, not a driver-pinned cache.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor the
#: driver uses. At true 100 TB deployments customer/part grow, but
#: region/nation/supplier stay broadcastable by construction (TPC-H
#: semantics); join helpers only force-broadcast tables in this set.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as int64 nanos; truncate to micros with
        # integer division (exact — double division would lose bits at
        # int64 magnitude), matching DuckDB's nanos→micros truncation.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def non_pushable(pred: Column) -> Column:
    """Mark a filter predicate as non-pushable.

    PushDownPredicates substitutes a filter's aliases and sinks the
    predicate through projections and repartition exchanges — which
    re-evaluates expensive projected expressions (XML/HTML parses, map
    builds) a second time inside the pre-exchange single-split scan
    stage, single-threaded. The rule only moves DETERMINISTIC
    predicates, so AND-ing a vacuously-true non-deterministic conjunct
    pins the filter where it was written, after the projection it
    consumes. Three traps found empirically (Spark 4.1):

    - an AND conjunct gets SPLIT and the deterministic part pushed
      anyway — the guard must be an OR (not separable);
    - ``rand()``-based guards get optimized away (range analysis knows
      rand ∈ [0,1), so ``rand() < -1`` folds to false);
    - an unused non-deterministic projected column is stripped by
      ColumnPruning before pushdown runs.

    ``spark_partition_id() < -1`` survives: non-deterministic, no
    range reasoning, free to evaluate. Use only where the predicate
    references expensive projected columns; cheap predicates SHOULD
    push to the scan.
    """
    return pred | (F.spark_partition_id() < F.lit(-1))


def parallelize_rows(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Spread rows across cores before CPU-heavy per-row expressions —
    but ONLY when the input is actually under-split.

    The driver fixtures are single-row-group parquet files, so their
    scan yields ONE split and every downstream narrow expression runs
    single-threaded; a round-robin repartition (cheap: the fixture is
    MBs) restores parallelism. At production scale the same table is
    thousands of splits and an unconditional repartition would inject a
    full round-robin shuffle of the corpus before any narrow work — AQE
    coalesces post-shuffle partitions but never elides the exchange
    itself. So the gate is MEASURED: ask the planned scan how many
    partitions it produces (no job runs — this is split planning only)
    and return the input untouched when it already meets the target.
    """
    from ooh_etl_spark.session import default_parallelism

    target = partitions or default_parallelism()
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: plan not convertible
        current = 0
    if current >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
