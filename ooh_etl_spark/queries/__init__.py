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
#: module import order. Round-11 rotation (per VERDICT r10 item 2,
#: executing the in-file schedule verbatim): keep the §2.A reference
#: contract and the streaming trio (6 pinned slots); the 44 fresh
#: slots are ALL first-time-in-window entries — first the complete
#: round-10 wave (q191b, q433–q439, q31b — 9 entries, newest-code-
#: first; judge-verified at sf0.01 in VERDICT r10 but never driver-
#: confirmed), then the first 35 never-seen members of q192–q231 in
#: registry-number order (q229/q230/q231 roll to r12). Never-seen
#: drops 92 → 48 (new r11 queries excluded; they enter in r12).
#: Everything rotated out stays green in the full-registry replica
#: (tools/check_oracle.py --strict).
#:
#: DEBT SCHEDULE (never-driver-seen: 160 after r8 → 127 after r9 →
#: 92 after r10 → 48 after this window; 44 fresh slots per round;
#: new-query volume capped ≤20/round per VERDICT r6 item 4 so the
#: debt strictly drains):
#:   r12: q229–q231, q233–q263/q266/q268 tail, q349/q368–q375, the
#:        b-variants (q72b/q139b/q149b), then the r11 wave (q334b,
#:        q440–q458 — 20 entries) — drains to ~0, after which
#:        rotation becomes newest-code-first only.
_DRIVER_WINDOW = [
    # reference surface + flagship analog (§2.A contract, every round)
    "flagship_doc_scan",
    "q_ooh_records",
    "q_ooh_report",
    # streaming trio: batch twin w/ oracle + true stream + stateful
    "q33_tumbling_hourly",
    "q36_stream_tumbling",
    "q46_stream_user_profiles",
    # r11 block 1: the complete round-10 wave — newest code first
    # (judge-verified sf0.01 in VERDICT r10; driver confirmation here)
    "q191b_link_prediction_capped",
    "q433_dsir_importance",
    "q434_bm25_hard_negatives",
    "q435_token_budget_epochs",
    "q436_link_topk_per_node",
    "q437_ivf_recall_curve",
    "q438_wimbd_ngram_census",
    "q439_filter_ensemble_census",
    "q31b_ann_lsh_det",
    # r11 block 2: oldest debt — first 35 never-seen members of
    # q192–q231 in registry-number order (q229–q231 roll to r12)
    "q192_welch_t_test",
    "q193_poisson_bootstrap",
    "q194_dbscan",
    "q195_collocations_pmi",
    "q196_roc_auc",
    "q197_gini_by_nation",
    "q198_cusum_changepoint",
    "q199_mase_seasonal",
    "q200_hhi_concentration",
    "q201_bpe_merge_pairs",
    "q202_negative_sampling",
    "q203_epoch_shuffle",
    "q204_join_size_estimate",
    "q205_knn_shapley",
    "q206_quality_yield_curve",
    "q207_decayed_trending",
    "q208_weighted_median",
    "q210_cohens_kappa",
    "q211_kaplan_meier",
    "q212_event_path_trigrams",
    "q213_mad_outliers",
    "q214_luhn_check_digits",
    "q215_bpe_merge_round",
    "q217_unigram_viterbi",
    "q218_audio_frame_features",
    "q219_image_luma_histogram",
    "q220_stream_static_enrich",
    "q221_hll_registers",
    "q222_markov_attribution",
    "q223_pseudonymized_join",
    "q224_video_motion_energy",
    "q225_dp_noisy_counts",
    "q226_msprt_sequential",
    "q227_quantile_treatment_effect",
    "q228_item_cf_cosine",
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
