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
from ooh_etl_spark.queries import retrieval_ops  # noqa: F401
from ooh_etl_spark.queries import linkage_ops  # noqa: F401
from ooh_etl_spark.queries import ml_ops  # noqa: F401
from ooh_etl_spark.queries import warehouse_ops  # noqa: F401

# windows.py registers q149b with q149's oracle, so it imports after
# stats_tests (and last overall — its entries rotate into the driver
# window in a later round).
from ooh_etl_spark.queries import windows  # noqa: E402,F401

#: The driver's correctness gate checks the FIRST 50 registry entries,
#: so the head of the registry is chosen deliberately rather than by
#: module import order. Round-5 rotation (VERDICT r4 item 4): keep the
#: §2.A reference contract and the streaming trio; q168/q170/q171
#: (r4's red rows, HUGEINT oracle class, now CAST) stay until
#: driver-green; the six LATENT members of the same class
#: (q159/q162/q183/q209/q216/q232, also CAST this round) rotate in to
#: prove the class fix at the driver; the remaining 35 slots go to
#: never-driver-seen queries — the q104–q117 wave, the newest r4
#: stats/experimentation wave (q279–q289, newest code = highest
#: latent risk), the ML-eval quintet q274–q278, and the behavioral
#: wave q264–q273. Everything rotated out stays green in the full
#: registry replica (tools/check_oracle.py --strict).
_DRIVER_WINDOW = [
    # reference surface + flagship analog (§2.A contract, every round)
    "flagship_doc_scan",
    "q_ooh_records",
    "q_ooh_report",
    # streaming trio: batch twin w/ oracle + true stream + stateful
    "q33_tumbling_hourly",
    "q36_stream_tumbling",
    "q46_stream_user_profiles",
    # r4 red rows — CAST(sum AS BIGINT) fix; stay until driver-green
    "q168_logreg_gradient",
    "q170_calibration_bins",
    "q171_recursive_hierarchy",
    # latent members of the same HUGEINT class, cast this round —
    # their driver-green proves the class fix, not just the instances
    "q159_pq_codes",
    "q162_corpus_build",
    "q183_trailing_hour_sum",
    "q209_embedding_gram",
    "q216_simpsons_paradox",
    "q232_arrow_python_udf",
    # first-time driver exposure: q104–q117 data-quality/graph wave
    "q104_dim_stats",
    "q105_cosine_histogram",
    "q107_zscore_anomalies",
    "q108_rolling_actives",
    "q109_incremental_agg",
    "q110_skew_profiler",
    "q111_constraint_census",
    "q112_column_profiler",
    "q113_snapshot_diff",
    "q114_winsorized_mean",
    "q115_lateral_topk",
    "q116_pagerank_step",
    "q117_market_basket",
    # newest r4 stats wave (newest code first)
    "q279_median_ci",
    "q280_mann_whitney",
    "q281_spearman",
    "q282_cramers_v",
    "q283_cohens_d",
    "q284_seasonality_strength",
    "q286_partition_layout_report",
    "q287_tukey_fences",
    "q288_mix_shift_decomposition",
    "q289_novelty_effect_trend",
    # ML-evaluation quintet
    "q274_youden_threshold",
    "q275_expected_calibration_error",
    "q276_average_precision",
    "q277_brier_score",
    "q278_logloss",
    # behavioral / experimentation wave
    "q264_intersession_gaps",
    "q265_actor_concentration",
    "q267_behavior_entropy",
    "q269_funnel_step_latency",
    "q270_srm_check",
    "q271_ratio_metric_delta",
    "q273_revenue_retention",
]

#: The driver gate is exactly 50 entries; a 51st silently falls off
#: (round 3 lost q130 this way). Enforced here AND in tests.
assert len(_DRIVER_WINDOW) == 50, f"driver window is {len(_DRIVER_WINDOW)}, not 50"
assert len(set(_DRIVER_WINDOW)) == 50, "duplicate entries in driver window"


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
