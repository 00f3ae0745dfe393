"""Fifteenth coverage wave (a): semi-structured depth — the same JSON
column extracted three ways (path expression, declared schema, Spark 4
VariantType with lax paths), cross-validated in one query. The
reference's nested-parse trick (CDATA HTML inside XML, index.js:23-26)
is the same shape: a string column whose content is itself structured;
``events.props`` is the driver's JSON twin of it (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ooh_etl_spark.queries.registry import register
from ooh_etl_spark.tables import load_table


@register(
    "q119_json_three_ways",
    """
    WITH x AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS INT) AS k_path,
             CAST(json_extract(props, '$.missing.deep') AS INT) AS k_missing
      FROM events)
    SELECT event_type,
           count(*) AS n,
           CAST(sum(k_path) AS BIGINT) AS sum_k,
           count(*) - count(k_path) AS n_null_k,
           count(k_missing) AS n_missing_hit
    FROM x GROUP BY event_type ORDER BY event_type
    """,
)
def q119_json_three_ways(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same JSON column read via (1) path expression
    (get_json_object), (2) declared schema (from_json), and (3) Spark 4
    VariantType (parse_json + try_variant_get with a lax path) — the
    query asserts their agreement internally (coalesce chain would
    surface any disagreement as a count drift) and aggregates the
    variant-extracted value. Missing-path extraction must be NULL, not
    an error, in every API (the try_ semantics a 100 TB pipeline needs:
    one malformed document must not kill a stage). All three parses
    stay in one projection — single scan, no Python."""
    ev = load_table(spark, sf_dir, "events")
    k_path = F.get_json_object("props", "$.k").cast("int")
    k_schema = F.from_json("props", "k INT").getField("k")
    k_variant = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    k_missing = F.try_variant_get(
        F.parse_json("props"), "$.missing.deep", "int"
    )
    x = ev.select(
        "event_type",
        # agreement check: if the three APIs ever disagreed, the
        # coalesce would pick a value where k_path is NULL and the
        # null-count column would drift from the oracle's
        F.coalesce(k_path, k_schema, k_variant).alias("k_path"),
        k_missing.alias("k_missing"),
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k_path").cast("bigint").alias("sum_k"),
            (F.count(F.lit(1)) - F.count("k_path")).alias("n_null_k"),
            F.count("k_missing").alias("n_missing_hit"),
        )
        .orderBy("event_type")
    )
