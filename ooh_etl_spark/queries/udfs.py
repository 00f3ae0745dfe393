"""UDF/UDTF surface: the sanctioned Python escape hatches, demonstrated
on paths where built-ins genuinely end (custom math, generator-style
row expansion) — each Arrow-batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ooh_etl_spark.queries.registry import register
from ooh_etl_spark.tables import load_table


@F.pandas_udf(T.DoubleType())
def _sigmoid(v: pd.Series) -> pd.Series:
    # Vectorized numpy math over Arrow batches — the pandas-UDF hot path.
    return 1.0 / (1.0 + (-v).map(math.exp))


@register(
    "q47_pandas_udf_sigmoid",
    """
    SELECT event_type,
           round(avg(round(1.0 / (1.0 + exp(-value / 100.0)), 6) * 1000000) / 1000000, 6)
             AS avg_sigmoid
    FROM events
    GROUP BY event_type
    """,
)
def q47_pandas_udf_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF scored per row, aggregated by type. The UDF
    computes what SQL ``exp`` computes, so the oracle can mirror it —
    the point under test is the Arrow UDF boundary itself."""
    events = load_table(spark, sf_dir, "events")
    sig = F.round(_sigmoid(F.col("value") / 100.0), 6)
    return (
        events.withColumn("sig", sig)
        .groupBy("event_type")
        .agg(F.round(F.avg(F.col("sig") * 1000000) / 1000000, 6).alias("avg_sigmoid"))
    )


@F.udtf(returnType="word: string, pos: int")
class SplitWords:
    """Python UDTF (table function): one input string → N rows. The
    generator-style row expansion built-ins can't express when per-row
    Python logic drives the expansion."""

    def eval(self, text: str):  # noqa: ANN201
        for i, w in enumerate(str(text).lower().split()):
            yield (w, i)


@register(
    "q48_udtf_tokens",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents WHERE doc_id < 50)
    SELECT doc_id, word, count(*) AS n
    FROM tok GROUP BY doc_id, word
    """,
)
def q48_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one row in, N token rows out —
    the registered-UDTF path for row-expanding logic that isn't an
    array explode."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("split_words", SplitWords)
    return spark.sql(
        """
        SELECT doc_id, t.word, count(*) AS n
        FROM udtf_docs, LATERAL split_words(text) AS t
        GROUP BY doc_id, t.word
        """
    )
