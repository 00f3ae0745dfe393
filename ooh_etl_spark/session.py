"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads,
single JVM); the configuration below is chosen so the *same logical
plans* deploy unchanged to a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  selection) so plans tuned at sf0.1 survive a 100x scale-up.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalesces from a high initial number, so queries never
  hard-code partition counts.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (naive-UTC) byte for byte.
- Arrow enabled for any pandas interchange (vectorized UDF boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "ooh_etl_spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime filter injection (SPARK-32268): executor-built bloom
        # filters planted at the fact scan when stats warrant — the
        # JVM-side form of a hand-rolled bloom prefilter (q121).
        # (runtimeFilter.semiJoinReduction deadlocks this Spark build on
        # any action — verified on spark.range(5).count() — so only the
        # bloom-filter flavor is enabled.)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Progress-bar carriage returns interleave with stdout and
        # corrupted the driver's parse of bench.py's final JSON line
        # in rounds 4-5 ("parsed": null).
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert (tables.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # JS-object assignment overwrites duplicate keys (index.js:63-66);
        # map_from_entries must mirror last-wins, not throw.
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # Keep catalog-table files (bucketed-join tests) out of the repo.
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
