"""Query catalog: every operator from SURVEY.md §2 exposed as a named query.

Each module registers queries into :mod:`ooh_etl_spark.queries.registry`;
importing this package populates the catalog. ``__spark_entry__.py``
re-exports it to the driver.
"""

from ooh_etl_spark.queries.registry import QUERIES, get_queries, get_oracles

# Import for side effect: each module registers its queries.
from ooh_etl_spark.queries import flagship  # noqa: F401
from ooh_etl_spark.queries import relational  # noqa: F401
from ooh_etl_spark.queries import windows  # noqa: F401
from ooh_etl_spark.queries import text  # noqa: F401
from ooh_etl_spark.queries import dedup  # noqa: F401
from ooh_etl_spark.queries import similarity  # noqa: F401
from ooh_etl_spark.queries import multimodal  # noqa: F401
from ooh_etl_spark.queries import advanced  # noqa: F401
from ooh_etl_spark.queries import udfs  # noqa: F401
from ooh_etl_spark.queries import advanced2  # noqa: F401
from ooh_etl_spark.queries import advanced3  # noqa: F401
from ooh_etl_spark.queries import tpch_shapes  # noqa: F401
from ooh_etl_spark.queries import tpch_shapes2  # noqa: F401
from ooh_etl_spark.queries import pipeline_ops  # noqa: F401
from ooh_etl_spark.queries import llm_ops2  # noqa: F401
from ooh_etl_spark.queries import quality_ops  # noqa: F401
from ooh_etl_spark.queries import text_stats  # noqa: F401
from ooh_etl_spark.queries import event_analytics  # noqa: F401
from ooh_etl_spark.queries import vector_ops  # noqa: F401
from ooh_etl_spark.queries import timeseries_ops  # noqa: F401
from ooh_etl_spark.queries import validation_ops  # noqa: F401
from ooh_etl_spark.queries import graph_sql_ops  # noqa: F401
from ooh_etl_spark.queries import json_ops  # noqa: F401
from ooh_etl_spark.queries import sketch_ops  # noqa: F401
from ooh_etl_spark.queries import bi_ops  # noqa: F401
from ooh_etl_spark.queries import search_ops  # noqa: F401
from ooh_etl_spark.queries import experiment_ops  # noqa: F401
from ooh_etl_spark.queries import stats_tests  # noqa: F401
from ooh_etl_spark.queries import streaming  # noqa: F401
from ooh_etl_spark.queries import ooh_surface  # noqa: F401

__all__ = ["QUERIES", "get_queries", "get_oracles"]
