"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in :mod:`ooh_etl_spark`; this module is a thin
adapter over its query registry (one entry per operator from
SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's full pipeline shape (scan → nested parse → map fold →
    EXISTS-over-map-keys filter → formatted sink; SURVEY.md §3.1)
    re-expressed on the ``documents`` table.
    """
    from ooh_etl_spark.queries.flagship import flagship_df

    return flagship_df(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ooh_etl_spark.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only)."""
    from ooh_etl_spark.queries import get_oracles

    return get_oracles()
