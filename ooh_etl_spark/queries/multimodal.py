"""Multimodal-column queries: binary payloads + metadata + features."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ooh_etl_spark.operators.multimodal import attach_payload, extract_features
from ooh_etl_spark.queries.registry import register
from ooh_etl_spark.tables import load_table


@register(
    "q32_multimodal_meta",
    """
    SELECT doc_id,
           'application/octet-stream' AS mime,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def q32_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The typed-metadata side of the payload schema is exact and
    oracle-checkable even though the decoder is a stub."""
    docs = load_table(spark, sf_dir, "documents")
    p = attach_payload(docs)
    return p.select("doc_id", F.col("meta.mime").alias("mime"), F.col("meta.n_bytes").alias("n_bytes"))


@register("q32b_multimodal_features", None)  # stub decoder → rows-only
def q32b_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction over binary payloads via
    mapInPandas (Arrow batches) — the decode step is a deterministic
    stub (no image libs in this container); schema, batching, and
    partitioning are the real plumbing under test.

    The feature vector is serialized to a fixed-format string for the
    output (the harness canonicalizer cannot hash raw array columns);
    the mapInPandas stage still produces and tests array<float>."""
    from ooh_etl_spark.tables import parallelize_rows

    docs = parallelize_rows(load_table(spark, sf_dir, "documents"))
    feats = extract_features(attach_payload(docs))
    return feats.select(
        "doc_id",
        "mime",
        "n_bytes",
        F.array_join(
            F.transform(F.col("features"), lambda x: F.format_string("%.2f", x)), ","
        ).alias("features_csv"),
    )
