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
#: module import order. Round-6 rotation (VERDICT r5 items 1+6): keep
#: the §2.A reference contract and the streaming trio (6 pinned
#: slots); ALL 33 round-5 queries (q290–q322 — replica-green but
#: never driver-seen, the newest code and therefore highest latent
#: risk) rotate in, plus the next 11 never-driver-seen entries from
#: the q123–q134 block. Everything rotated out stays green in the
#: full-registry replica (tools/check_oracle.py --strict).
#:
#: DEBT SCHEDULE (never-driver-seen drains provably, ~146 left after
#: this window; 44 fresh slots per round). Newest code rotates first:
#:   r7: the round-6 wave q323–q341 (19, written this round) + the
#:       late-round-6 waves q342–q416 overflow as slots allow, then the
#:       q52–q90 relational/TPC-H tail (q52,q53,q54,q56,q58,q61–q65,
#:       q67,q69,q70,q71,q75,q76,q78,q80,q82–q90 — 25)
#:   r8: q93–q103 wave + q125–q165 never-seen members (q125–q151,
#:       q160–q165) + q174/q179–q199 never-seen members
#:   r9: q200–q263 never-seen members (sketches, time-series,
#:       behavioral tails) — after which every registered query has
#:       driver history and rotation becomes newest-code-first only.
_DRIVER_WINDOW = [
    # reference surface + flagship analog (§2.A contract, every round)
    "flagship_doc_scan",
    "q_ooh_records",
    "q_ooh_report",
    # streaming trio: batch twin w/ oracle + true stream + stateful
    "q33_tumbling_hourly",
    "q36_stream_tumbling",
    "q46_stream_user_profiles",
    # the full round-5 wave: replica-green, zero driver exposure yet
    "q290_binary_quantize_hamming",
    "q291_suffix_lcp_profile",
    "q292_sequence_pattern",
    "q293_bayes_ucb_bandit",
    "q294_isotonic_calibration",
    "q295_bh_fdr",
    "q296_symspell_edit_join",
    "q297_quantile_normalization",
    "q298_conformal_intervals",
    "q299_hill_tail_index",
    "q300_eb_rate_shrinkage",
    "q301_kmv_set_sketch",
    "q302_neyman_allocation",
    "q303_ips_offline_eval",
    "q304_shapley_attribution",
    "q305_qini_uplift",
    "q306_bleu_pairs",
    "q307_blocking_quality",
    "q308_wasserstein_drift",
    "q309_mmd_linear",
    "q310_map_in_arrow",
    "q311_observed_metrics",
    "q312_compaction_planner",
    "q313_clustering_factor",
    "q314_zonemap_skipping",
    "q315_acf",
    "q316_spectral_power",
    "q317_rake_keywords",
    "q318_t_closeness",
    "q319_fellegi_sunter",
    "q320_holm_bonferroni",
    "q321_matching_att",
    "q322_kcenter_coreset",
    # next never-driver-seen block (q123–q134)
    "q123_important_stock",
    "q124_idle_rich_customers",
    "q135_bm25_search",  # (q125 is rows-only by design; an
    # oracle-bearing entry makes a stronger driver green — q125 drains
    # with the r8 block)
    "q126_ewma_last20",
    "q127_mom_growth",
    "q128_pareto_abc",
    "q129_funnel_depth",
    "q131_rank_family",
    "q132_datetime_gauntlet",
    "q133_conditional_aggs",
    "q134_error_bursts",
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
