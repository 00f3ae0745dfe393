"""Query catalog: every operator from SURVEY.md §2 exposed as a named query.

Each module registers queries into :mod:`ooh_etl_spark.queries.registry`;
importing this package populates the catalog. ``__spark_entry__.py``
re-exports it to the driver.
"""

from ooh_etl_spark.queries.registry import QUERIES, get_queries, get_oracles

# Import for side effect: each module registers its queries.
from ooh_etl_spark.queries import flagship  # noqa: F401
from ooh_etl_spark.queries import relational  # noqa: F401
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

# windows.py registers q149b with q149's oracle, so it imports after
# stats_tests (and last overall — its entries rotate into the driver
# window in a later round).
from ooh_etl_spark.queries import windows  # noqa: E402,F401

#: The driver's correctness gate checks the FIRST 50 registry entries,
#: so the head of the registry is chosen deliberately rather than by
#: module import order: the §2.A reference contract (q_ooh_records /
#: q_ooh_report vs index.js), the full streaming family, one green
#: representative per already-verified §2.B family (so no family loses
#: its green row), and one representative per not-yet-driver-verified
#: wave. The remaining queries keep import order and rotate into the
#: window in later rounds.
_DRIVER_WINDOW = [
    # reference surface + flagship analog
    "flagship_doc_scan",
    "q_ooh_records",
    "q_ooh_report",
    # event-time windowing: batch twins (oracle) + true streaming (rows-only)
    "q33_tumbling_hourly",
    "q34_sliding_windows",
    "q35_session_windows",
    "q36_stream_tumbling",
    "q37_stream_dedup",
    "q46_stream_user_profiles",
    "q118_stream_stream_join",
    # one green representative per verified family (round-1/2 window)
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_top_revenue_orders",
    "q05_regional_revenue",
    "q07_acctbal_band_join",
    "q09_rollup_returns",
    "q11_distinct_counts",
    "q12_setops_customers",
    "q13_asof_event_order",
    "q16_top3_orders_per_customer",
    "q19_pivot_linestatus",
    "q21_word_counts",
    "q26_exact_dedup",
    "q27_jaccard_pairs",
    "q30_knn_cosine",
    "q32_multimodal_meta",
    "q45_array_functions",
    "q47_pandas_udf_sigmoid",
    "q48_udtf_tokens",
    "q49_dup_clusters",
    "q51_cheapest_supplier_per_part",
    # first-time driver exposure: one per unverified wave
    "q57_range_frame",
    "q60_map_functions",
    "q66_bpe_token_count",
    "q68_gap_fill",
    "q72_price_quartiles",
    "q74_doc_chunking",
    "q77_embedding_quantize",
    "q79_quality_rules",
    "q81_decontamination",
    "q91_profit_by_nation",
    "q92_token_entropy",
    "q97_funnel_conversion",
    "q102_kmeans_step",
    "q106_ohlc_bars",
    "q119_json_three_ways",
    "q120_heavy_hitters",
    "q121_bloom_prefilter_join",
    "q55_arg_extrema",
    "q59_merge_upsert",
    "q130_regex_gauntlet",
]


def _reorder_registry() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    if missing:  # pragma: no cover - registration bug, caught by tests
        raise KeyError(f"driver-window queries not registered: {missing}")
    head = set(_DRIVER_WINDOW)
    ordered = [*_DRIVER_WINDOW, *(n for n in QUERIES if n not in head)]
    snapshot = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(snapshot)


_reorder_registry()

__all__ = ["QUERIES", "get_queries", "get_oracles"]
