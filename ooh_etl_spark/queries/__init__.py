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
#: module import order. Round-10 rotation (per VERDICT r9 item 2,
#: executing the schedule below verbatim): keep the §2.A reference
#: contract and the streaming trio (6 pinned slots); the 44 fresh
#: slots are ALL first-time-in-window entries — first the complete
#: round-9 wave (q423b/q425–q432/q151c/q27b, 11 entries — the funnel
#: variants that SCALE.md's 67x/28x cure claims rest on), then the
#: q99–q103 never-seen members, then the oldest debt tail in
#: registry-number order: q125–q150, q174, q179–q191. Never-seen
#: drops 127 → 83 (new r10 queries excluded; they enter in r11).
#: Everything rotated out stays green in the full-registry replica
#: (tools/check_oracle.py --strict).
#:
#: DEBT SCHEDULE (never-driver-seen: 160 after r8 → 127 after r9 →
#: 92 after this window, counting the nine r10 additions q191b/
#: q433–q439/q31b; 44 fresh slots per round; new-query volume capped
#: ≤20/round per VERDICT r6 item 4 so the debt strictly drains):
#:   r11: the round-10 wave first (q191b, q433–q439, q31b — 9 entries,
#:        newest-code-first), then q192–q231 never-seen members in
#:        number order — takes never-seen to ~48.
#:   r12: q233–q263/q266/q268 tail, q349/q368–q375, the b-variants
#:        (q72b/q139b/q149b) — drains to ~0, after which rotation
#:        becomes newest-code-first only.
_DRIVER_WINDOW = [
    # reference surface + flagship analog (§2.A contract, every round)
    "flagship_doc_scan",
    "q_ooh_records",
    "q_ooh_report",
    # streaming trio: batch twin w/ oracle + true stream + stateful
    "q33_tumbling_hourly",
    "q36_stream_tumbling",
    "q46_stream_user_profiles",
    # r10 block 1: the complete round-9 wave — never driver-seen; the
    # funnel variants carry the measured 67x/28x scale-cure claims
    "q423b_split_leakage_audit_funnel",
    "q425_bow_fingerprint_dedup",
    "q426_cluster_representatives",
    "q427_minhash_calibration",
    "q428_rouge2_pair_overlap",
    "q429_mergeable_quantile_summary",
    "q430_stopword_gate",
    "q431_shingle_containment",
    "q432_source_js_divergence",
    "q151c_semdedup_funnel",
    "q27b_jaccard_pairs_funnel",
    # r10 block 2: q99–q103 never-seen members
    "q99_transition_matrix",
    "q100_first_touch_attribution",
    "q101_growth_accounting",
    "q103_power_iteration",
    # r10 block 3: oldest debt — q125–q150/q174/q179–q191 never-seen
    "q125_compression_quality",
    "q136_association_rules",
    "q137_target_encoding",
    "q138_weighted_sample",
    "q139_equi_depth_histogram",
    "q140_wilson_ctr",
    "q141_time_to_convert",
    "q142_k_anonymity",
    "q143_interval_overlap",
    "q144_zorder_clustering",
    "q145_chi_square",
    "q146_mutual_information",
    "q147_benford_digits",
    "q148_binary_encoding",
    "q149_id_gap_detection",
    "q150_pythagorean_means",
    "q174_stream_session",
    "q179_collation_group",
    "q180_multimodal_resize",
    "q181_video_frame_sample",
    "q182_three_valued_logic",
    "q184_cuped_adjustment",
    "q185_k_core",
    "q186_bfs_hops",
    "q187_naive_bayes_train",
    "q188_naive_bayes_classify",
    "q189_fd_histogram",
    "q190_skyline",
    "q191_link_prediction",
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
