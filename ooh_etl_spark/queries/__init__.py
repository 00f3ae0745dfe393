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
#: module import order. Round-7 rotation (VERDICT r6 item 3): keep
#: the §2.A reference contract and the streaming trio (6 pinned
#: slots); all 44 fresh slots go to the round-6 wave, newest-first:
#: q323–q348 + q350–q367 (q349 is rows-only by design — an
#: oracle-bearing entry makes a stronger driver green, so it drains
#: with a later block, same call as q125 in r6). Everything rotated
#: out stays green in the full-registry replica
#: (tools/check_oracle.py --strict).
#:
#: DEBT SCHEDULE (never-driver-seen: 240 after r6 → 196 after this
#: window; 44 fresh slots per round; new-query volume capped ≤20/round
#: per VERDICT r6 item 4 so the debt strictly drains):
#:   r8: rest of the round-6 wave q368–q416 (49 incl. q349) — minus
#:       whatever the r7 cap adds, newest first
#:   r9: the q52–q90 relational/TPC-H tail (25) + q93–q103 wave +
#:       q125–q151/q160–q165 never-seen members
#:   r10: q174/q179–q263 never-seen members (sketches, time-series,
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
    # the round-6 wave, newest-first (44 oracle-bearing first-timers)
    "q323_mcnemar",
    "q324_matryoshka_fidelity",
    "q325_anova_oneway",
    "q326_kruskal_wallis",
    "q327_normalized_exact_dedup",
    "q328_iv_wald",
    "q329_sort_key_advisor",
    "q330_theil_sen_trend",
    "q331_cramer_von_mises",
    "q332_image_ahash_neardup",
    "q333_hits_authority",
    "q334_mutual_nn_pairs",
    "q335_golden_record",
    "q336_salted_skew_join",
    "q337_pivot_segment_matrix",
    "q338_kneser_ney_bigram",
    "q339_stratified_kfold",
    "q340_rendezvous_sharding",
    "q341_srp_lsh_pairs",
    "q342_colbert_maxsim",
    "q343_bcubed_cluster_eval",
    "q344_coec_position_bias",
    "q345_dedup_threshold_sweep",
    "q346_dispersion_dp",
    "q347_markov_heldout_ppl",
    "q348_factorial_interaction",
    "q350_incremental_dedup",
    "q351_lexicon_flagging",
    "q352_classical_decomposition",
    "q353_nucleus_vocab_coverage",
    "q354_label_spreading",
    "q355_woe_information_value",
    "q356_copeland_tournament",
    "q357_bradley_terry_step",
    "q358_sink_roundtrip",
    "q359_length_bucket_packing",
    "q360_best_of_n_reward",
    "q361_jaro_winkler_vocab",
    "q362_mann_kendall",
    "q363_boxcox_profile",
    "q364_doubly_robust_ope",
    "q365_rdd_local_linear",
    "q366_good_turing",
    "q367_textrank_keywords",
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
