"""Round-13 additions: the q479 corpus-build capstone funnel, plus
semantic invariants the oracle compare alone cannot pin (stage
monotonicity, weight normalization, bench-split exclusion)."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tests.conftest import SF_DIR, assert_matches_oracle  # noqa: E402

from ooh_etl_spark.queries import QUERIES  # noqa: E402

WAVE = [
    "q479_corpus_build_funnel",
    "q480_gopher_repetition_census",
    "q481_funnel_stage_overlap",
    "q482_gate_threshold_curve",
]


def run(spark, name, sf_dir=SF_DIR):
    return QUERIES[name].fn(spark, sf_dir)


def test_all_wave_queries_match_oracle(spark, duck):
    for name in WAVE:
        assert_matches_oracle(spark, duck, name)


def test_all_wave_queries_registered_with_oracles(spark):
    for name in WAVE:
        assert name in QUERIES, name
        assert QUERIES[name].oracle is not None, f"{name} must be oracle-backed"


# --- q479: corpus-build funnel invariants ----------------------------------


def _rows(spark):
    return {
        (r["stage"], r["source"]): r
        for r in run(spark, "q479_corpus_build_funnel").collect()
    }


def test_q479_stage_yields_monotone_nonincreasing(spark):
    """Stages 0-4 only ever REMOVE docs/tokens, per source."""
    rows = _rows(spark)
    sources = {s for (_, s) in rows}
    assert len(sources) == 20
    for s in sources:
        for stage in range(1, 5):
            prev, cur = rows[(stage - 1, s)], rows[(stage, s)]
            assert cur["n_docs"] <= prev["n_docs"], (s, stage)
            assert cur["n_tokens"] <= prev["n_tokens"], (s, stage)
            assert 0 <= cur["metric_bp"] <= 10000, (s, stage)


def test_q479_stage0_is_the_bench_excluded_corpus(spark):
    """Raw stage = all docs except the bench split, metric pinned 10000."""
    import duckdb

    rows = _rows(spark)
    n_raw = sum(r["n_docs"] for (st, _), r in rows.items() if st == 0)
    expected = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
        " WHERE doc_id % 97 <> 0"
    ).fetchone()[0]
    assert n_raw == expected
    assert all(
        r["metric_bp"] == 10000 for (st, _), r in rows.items() if st == 0
    )


def test_q479_mixture_weights_normalize(spark):
    """DoReMi weights sum to ~10000 bp (truncating div loses < |src| bp)
    and stages 5/6 carry the final corpus counts."""
    rows = _rows(spark)
    w = [r["metric_bp"] for (st, _), r in rows.items() if st == 5]
    assert 10000 - len(w) <= sum(w) <= 10000
    for s in {s for (_, s) in rows}:
        assert rows[(5, s)]["n_docs"] == rows[(4, s)]["n_docs"]
        assert rows[(6, s)]["n_tokens"] == rows[(4, s)]["n_tokens"]


def test_q479_packing_metric_matches_closed_form(spark):
    """pad_waste_bp recomputed from the final stage's token census must
    be consistent with the emitted value for at least the global check:
    every per-source value sits in [0, 10000) and is zero only when the
    source is empty or every doc is an exact multiple of 128."""
    rows = _rows(spark)
    for (st, s), r in rows.items():
        if st != 6:
            continue
        assert 0 <= r["metric_bp"] < 10000, (s, r["metric_bp"])
        if r["n_docs"] > 0:
            # fixture docs are ~16 tokens -> pad waste dominates; a zero
            # here would mean the pad arithmetic silently vanished
            assert r["metric_bp"] > 0, s


# --- q480: Gopher repetition census invariants ------------------------------


def test_q480_flag_hierarchy_and_coverage_bounds(spark):
    """flagged_any >= each individual rule's count per source; every
    flag count <= n_docs; the dup-3 coverage rule actually FIRES
    somewhere in the corpus (a silent-zero coverage computation would
    still oracle-match, so the signal itself is pinned)."""
    rows = run(spark, "q480_gopher_repetition_census").collect()
    assert len(rows) == 20
    for r in rows:
        for c in ("flagged_top2", "flagged_top3", "flagged_top4",
                  "flagged_dup3"):
            assert 0 <= r[c] <= r["n_docs"], (r["source"], c)
            assert r[c] <= r["flagged_any"], (r["source"], c)
        assert r["flagged_any"] <= (
            r["flagged_top2"] + r["flagged_top3"] + r["flagged_top4"]
            + r["flagged_dup3"]
        )
    assert sum(r["flagged_dup3"] for r in rows) >= 1
    assert sum(r["flagged_any"] for r in rows) >= 1


def test_q480_dup_coverage_position_union_golden(spark):
    """Golden pin of the position-set-union semantics on a constructed
    doc: 'a b c a b c x' has the duplicated 3-gram 'a b c' at starts
    1 and 4, covering positions {1..6} of 7 -> 8571 bp (NOT 6/7 of
    multiset mass double-counted)."""
    df = spark.createDataFrame([("a b c a b c x",)], "text string")
    got = df.selectExpr(
        "size(split(lower(trim(text)), '\\\\s+')) AS n_toks",
        "CASE WHEN size(split(lower(trim(text)), '\\\\s+')) >= 3 THEN"
        " transform(sequence(1, size(split(lower(trim(text)), '\\\\s+')) - 2),"
        " i -> array_join(slice(split(lower(trim(text)), '\\\\s+'), i, 3), ' '))"
        " ELSE array() END AS gd"
    ).selectExpr(
        "(10000 * size(array_distinct(flatten(transform("
        "filter(sequence(1, size(gd)),"
        " i -> size(filter(gd, h -> h = element_at(gd, i))) >= 2),"
        " i -> sequence(i, i + 2)))))) div n_toks AS bp"
    ).collect()[0]["bp"]
    assert got == 8571


# --- q481: stage kill-overlap invariants -------------------------------------


def test_q481_matrix_consistency(spark):
    """6 pair rows; kill counts are consistent across rows naming the
    same stage; both <= min(kills); exact/neardup structurally
    disjoint (neardup evaluates on exact survivors)."""
    rows = {(r["stage_a"], r["stage_b"]): r
            for r in run(spark, "q481_funnel_stage_overlap").collect()}
    assert len(rows) == 6
    kills = {}
    for (a, b), r in rows.items():
        assert r["both_kill"] <= min(r["kills_a"], r["kills_b"])
        assert r["only_a_kills"] == r["kills_a"] - r["both_kill"]
        assert r["only_b_kills"] == r["kills_b"] - r["both_kill"]
        assert 0 <= r["overlap_bp"] <= 10000
        for s, k in ((a, r["kills_a"]), (b, r["kills_b"])):
            assert kills.setdefault(s, k) == k, f"{s} inconsistent"
    assert rows[("exact", "neardup")]["both_kill"] == 0


def test_q479_checkpoint_cuts_hold(spark):
    """The funnel's stage boundaries must stay checkpointed: the final
    plan roots at ExistingRDD scans with a bounded exchange residue.
    Measured r13: checkpoints no-op'd -> 216 parquet scans / 427
    exchanges (every census re-derives the lineage); with the cuts ->
    zero parquet scans in the final plan and <= 5 exchanges."""
    from ooh_etl_spark.plans.audit import physical_plan, shuffle_count

    plan = physical_plan(
        QUERIES["q479_corpus_build_funnel"].fn(spark, SF_DIR)
    )
    assert plan.count("Scan parquet") == 0, plan.count("Scan parquet")
    assert shuffle_count(plan) <= 5, shuffle_count(plan)


# --- q482: gate threshold curve invariants -----------------------------------


def test_q482_monotone_and_anchored(spark):
    """Survivors are monotone in the swept threshold (non-increasing
    for the >= gates, non-decreasing for the <= repetition gate), and
    every gate's curve at its deployed default equals the all-default
    ensemble survivor count (the q465/q479 gate composition)."""
    rows = run(spark, "q482_gate_threshold_curve").collect()
    assert len(rows) == 20
    by_gate = {}
    for r in rows:
        by_gate.setdefault(r["gate"], []).append(r)
    defaults = {"len": 20, "alpha": 12, "stopword": 100, "repetition": 2000}
    anchor = None
    for gate, rs in by_gate.items():
        rs.sort(key=lambda r: r["threshold"])
        surv = [r["n_survivors"] for r in rs]
        toks = [r["tokens_survive"] for r in rs]
        if gate == "repetition":
            assert surv == sorted(surv), (gate, surv)
            assert toks == sorted(toks), (gate, toks)
        else:
            assert surv == sorted(surv, reverse=True), (gate, surv)
            assert toks == sorted(toks, reverse=True), (gate, toks)
        at_default = [
            r["n_survivors"] for r in rs if r["threshold"] == defaults[gate]
        ]
        assert len(at_default) == 1, gate
        anchor = anchor if anchor is not None else at_default[0]
        assert at_default[0] == anchor, (gate, at_default[0], anchor)
        assert len({r["n_docs"] for r in rs}) == 1
