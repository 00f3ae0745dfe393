"""Round-12 additions (q459–q470): sizing/audit operators for the
streaming, vector-index, corpus-prep, and warehouse families — each
with a full DuckDB oracle, plus semantic invariants the oracle compare
alone cannot pin (monotonicity of the curves, closed-form identities,
policy-divergence direction)."""
from __future__ import annotations

import pytest

# Oracle-replica / deep-functional suite: excluded from the default
# fast-core gate run (see pytest.ini); run with `-m slow`.
pytestmark = pytest.mark.slow

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from tests.conftest import SF_DIR, assert_matches_oracle  # noqa: E402

from ooh_etl_spark.queries import QUERIES  # noqa: E402

WAVE = [
    "q459_trigger_interval_curve",
    "q460_truncation_loss_curve",
    "q461_ivf_posting_balance",
    "q462_curriculum_quartile_schedule",
    "q463_splice_boundary_overlap",
    "q464_cross_source_dup_matrix",
    "q465_filter_agreement_matrix",
    "q466_dedup_survivor_policy",
    "q467_state_ttl_curve",
    "q468_chunk_stride_cost",
    "q469_embedding_norm_gate",
    "q470_bucket_sizing_advisor",
    "q471_join_state_peak_curve",
    "q472_inbatch_collision_curve",
    "q473_decon_order_curve",
    "q474_embedding_separability",
    "q475_bloom_sizing_advisor",
    "q476_watermark_lateness_curve",
    "q477_prototypicality_prune",
    "q478_sq_int8_recall",
]


def run(spark, name, sf_dir=SF_DIR):
    return QUERIES[name].fn(spark, sf_dir)


# --- oracle parity (the driver's compare, replicated) ----------------------


def test_all_wave_queries_match_oracle(spark, duck):
    for name in WAVE:
        assert_matches_oracle(spark, duck, name)


def test_all_wave_queries_registered_with_oracles(spark):
    for name in WAVE:
        assert name in QUERIES, name
        assert QUERIES[name].oracle is not None, f"{name} must be oracle-backed"


# --- q217 golden conversion (r12, VERDICT r11 item 6) -----------------------


def test_q217_matches_golden_oracle(spark, duck):
    # Unigram Viterbi vs the pure-Python sequential reference
    # (tools/make_golden.py::q217_reference), pinned as a guard-gated
    # VALUES oracle — the q125/q185 mechanism.
    assert_matches_oracle(spark, duck, "q217_unigram_viterbi")


def test_q217_golden_is_guard_gated():
    spec = QUERIES["q217_unigram_viterbi"]
    assert spec.oracle is not None
    assert spec.golden_guard is not None
    assert spec.golden_domain is not None and len(spec.golden_domain) == 2


def test_q32b_matches_oracle(spark, duck):
    # The stub-decoder plumbing is oracle-checked through the exact
    # int64 chunk sums (r12 conversion).
    assert_matches_oracle(spark, duck, "q32b_multimodal_features")


# --- q459: trigger-interval curve invariants -------------------------------


def test_q459_batch_count_monotone_and_mass_conserved(spark):
    rows = {r.trigger_s: r for r in run(spark, "q459_trigger_interval_curve").collect()}
    triggers = sorted(rows)
    # Longer trigger -> fewer (or equal) non-empty batches, bigger max batch.
    for a, b in zip(triggers, triggers[1:]):
        assert rows[a].n_batches >= rows[b].n_batches
        assert rows[a].ev_per_batch_max <= rows[b].ev_per_batch_max
    # Mean * batches ~ total events (integer milli floor).
    ev_total = rows[triggers[0]].n_batches * rows[triggers[0]].ev_per_batch_milli
    for t in triggers[1:]:
        approx = rows[t].n_batches * rows[t].ev_per_batch_milli
        # same corpus: totals agree within the milli-floor rounding of
        # one event per batch
        assert abs(approx - ev_total) <= 1000 * max(
            rows[t].n_batches, rows[triggers[0]].n_batches
        )


# --- q460: truncation loss invariants --------------------------------------


def test_q460_loss_monotone_in_max_len(spark):
    df = run(spark, "q460_truncation_loss_curve").collect()
    by_source: dict = {}
    for r in df:
        by_source.setdefault(r.source, []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r.max_len)
        for a, b in zip(rs, rs[1:]):
            assert a.loss_bp >= b.loss_bp, source  # longer budget, less loss
            assert a.tokens_kept <= b.tokens_kept
            assert a.truncated_docs >= b.truncated_docs
            assert a.tokens_total == b.tokens_total  # census invariant


# --- q461: posting balance invariants --------------------------------------


def test_q461_shares_sum_and_load_factor(spark):
    rows = run(spark, "q461_ivf_posting_balance").collect()
    assert len(rows) <= 16
    total = sum(r.n_vecs for r in rows)
    # share floors sum to <= 10000 and miss < |cells| bp
    s = sum(r.share_bp for r in rows)
    assert 10000 - len(rows) <= s <= 10000
    for r in rows:
        assert r.load_factor_bp == (10000 * r.n_vecs * len(rows)) // total


# --- q462: curriculum schedule invariants ----------------------------------


def test_q462_quartile_one_leads_each_source(spark):
    rows = run(spark, "q462_curriculum_quartile_schedule").collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r.source, {})[r.quartile] = r
    for source, qs in by_source.items():
        assert set(qs) == {1, 2, 3, 4}, source
        # Interleaved round-robin: quartile q's first position is q-1.
        for q, r in qs.items():
            assert r.first_pos == q - 1, (source, q)
        # Q1 ranks by n_chars desc -> its token mass >= Q4's (n_chars
        # correlates with token count in the whitespace fixture).
        assert qs[1].tokens >= qs[4].tokens, source


# --- q463: splice boundary invariants --------------------------------------


def test_q463_pair_arithmetic(spark):
    rows = run(spark, "q463_splice_boundary_overlap").collect()
    for r in rows:
        assert r.splice_pairs > 0
        assert r.splice_pairs <= r.n_prefix_docs * r.n_suffix_docs


# --- q464/q466: bag-of-words fingerprint family ----------------------------


def test_q464_symmetric_and_ordered(spark):
    rows = run(spark, "q464_cross_source_dup_matrix").collect()
    assert len(rows) > 0  # non-degenerate on the fixture
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert r.shared_digests >= 1


def test_q466_policy_identity(spark):
    r = run(spark, "q466_dedup_survivor_policy").collect()[0]
    assert r.n_dup_groups > 0  # non-degenerate on the fixture
    assert r.n_divergent <= r.n_dup_groups
    # Longest-copy survivor keeps at least as many chars as min-id.
    assert r.extra_chars_kept >= 0
    assert r.extra_chars_kept == r.maxlen_kept_chars - r.minid_kept_chars
    assert r.divergent_bp == (10000 * r.n_divergent) // r.n_dup_groups


# --- q467: TTL curve invariants --------------------------------------------


def test_q467_ttl_monotone(spark):
    rows = sorted(run(spark, "q467_state_ttl_curve").collect(), key=lambda r: r.ttl_s)
    for a, b in zip(rows, rows[1:]):
        assert a.n_users == b.n_users  # census invariant
        assert a.live_at_end <= b.live_at_end  # longer TTL, more live
        assert a.recreations >= b.recreations  # longer TTL, less churn
        assert a.total_creations == a.n_users + a.recreations


# --- q468: chunk stride closed forms ---------------------------------------


def test_q468_closed_form_against_enumeration(spark):
    rows = {r.stride: r for r in run(spark, "q468_chunk_stride_cost").collect()}
    # Recompute one stride by literally materializing the chunks in
    # Python over the fixture lengths.
    import duckdb

    lens = [
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT len(regexp_split_to_array(lower(trim(text)), '\\s+'))"
            f" FROM read_parquet('{SF_DIR}/documents.parquet')"
        )
        .fetchall()
    ]
    W, S = 64, 32
    chunks = emitted = 0
    for n in lens:
        pos, c = 0, 0
        while True:
            c += 1
            emitted += min(W, n - pos)
            if pos + W >= n:
                break
            pos += S
        chunks += c
    assert rows[S].n_chunks == chunks
    assert rows[S].tokens_emitted == emitted
    # stride == window -> zero overlap
    assert rows[64].overlap_bp == 0
    # smaller stride -> monotone more chunks and overlap
    strides = sorted(rows)
    for a, b in zip(strides, strides[1:]):
        assert rows[a].n_chunks >= rows[b].n_chunks
        assert rows[a].overlap_bp >= rows[b].overlap_bp


# --- q469: norm gate on a constructed corpus --------------------------------


def test_q469_flags_constructed_pathologies(spark, tmp_path):
    vecs = [
        np.zeros(8, dtype="float32"),                      # zero norm
        np.full(8, 0.1, dtype="float32"),                  # ||x||^2 = 0.08 low
        np.full(8, 1.0, dtype="float32"),                  # ||x||^2 = 8 high
        np.array([np.nan] + [0.5] * 7, dtype="float32"),   # NaN
        np.full(8, 0.35, dtype="float32"),                 # ||x||^2 = 0.98 pass
    ]
    df = pd.DataFrame(
        {
            "vec_id": np.arange(5, dtype="int64"),
            "embedding": vecs,
            "label": np.zeros(5, dtype="int32"),
        }
    )
    d = tmp_path / "emb12"
    d.mkdir()
    df.to_parquet(d / "embeddings.parquet", index=False)
    r = run(spark, "q469_embedding_norm_gate", str(d)).collect()[0]
    # NaN vectors carry the -1 sentinel: they land in nan_vecs and in
    # NO norm bucket (the engine-divergent CAST(NaN AS BIGINT) never
    # executes).
    assert (r.n_vecs, r.zero_norm, r.low_norm, r.high_norm, r.nan_vecs) == (
        5, 1, 1, 1, 1,
    )
    assert r.pass_bp == (10000 * 1) // 5


# --- q471: join-state curve invariants -------------------------------------


def test_q471_state_monotone_in_delay(spark):
    rows = sorted(
        run(spark, "q471_join_state_peak_curve").collect(), key=lambda r: r.delay_s
    )
    for a, b in zip(rows, rows[1:]):
        assert a.minutes_observed == b.minutes_observed  # census invariant
        assert a.peak_state_rows <= b.peak_state_rows  # longer retention
        assert a.mean_state_milli <= b.mean_state_milli
    for r in rows:
        assert r.peak_state_rows >= r.mean_state_milli // 1000


def test_q471_one_minute_delay_equals_minute_census_max(spark, duck):
    # delay of 1 minute would equal the raw minute census; the smallest
    # grid entry (5 min) must dominate the busiest single minute.
    import duckdb

    mx = (
        duckdb.connect()
        .execute(
            "SELECT max(c) FROM (SELECT CAST(floor(epoch(ts)) AS BIGINT)"
            " // 60 AS m, count(*) AS c FROM"
            f" read_parquet('{SF_DIR}/events.parquet') GROUP BY 1)"
        )
        .fetchone()[0]
    )
    rows = sorted(
        run(spark, "q471_join_state_peak_curve").collect(), key=lambda r: r.delay_s
    )
    assert rows[0].peak_state_rows >= mx


# --- q472: in-batch collision invariants -----------------------------------


def test_q472_collisions_monotone_in_batch_size(spark):
    rows = sorted(
        run(spark, "q472_inbatch_collision_curve").collect(),
        key=lambda r: r.batch_size,
    )
    total_docs_lb = rows[0].n_batches  # B=8 batches x >=1 doc
    assert total_docs_lb > 0
    for a, b in zip(rows, rows[1:]):
        assert a.n_batches >= b.n_batches  # bigger batches, fewer of them
        # coarser batching can only merge batches -> pair count grows
        assert a.dup_pairs_in_batch <= b.dup_pairs_in_batch
    for r in rows:
        assert r.colliding_batches <= r.n_batches
        assert r.colliding_bp == (10000 * r.colliding_batches) // r.n_batches


# --- q470: bucket advisor invariants ---------------------------------------


def test_q470_bucket_stats(spark):
    rows = {r.n_buckets: r for r in run(spark, "q470_bucket_sizing_advisor").collect()}
    for b, r in rows.items():
        assert r.filled_buckets <= b
        assert r.max_rows >= r.mean_rows
        assert r.skew_bp >= 10000 - b  # floor-rounding slack
    # More buckets -> smaller max bucket.
    bs = sorted(rows)
    for a, b in zip(bs, bs[1:]):
        assert rows[a].max_rows >= rows[b].max_rows


# --- q473: decontamination order curve invariants ---------------------------


def test_q473_flagged_non_increasing_in_order(spark):
    # A benchmark n-gram hit implies benchmark (n-1)-gram hits (every
    # sub-span of a bench gram is itself a bench gram), so the flagged
    # set can only shrink as the order grows.
    rows = run(spark, "q473_decon_order_curve").collect()
    assert len(rows) == 5
    flagged = [r.flagged_docs for r in rows]  # rows ordered by gram_order
    assert flagged == sorted(flagged, reverse=True), flagged
    cd = {r.corpus_docs for r in rows}
    assert len(cd) == 1  # corpus size is order-independent
    for r in rows:
        assert r.flagged_bp == (10000 * r.flagged_docs) // r.corpus_docs
        assert r.flagged_docs <= r.hit_occurrences or r.flagged_docs == 0


# --- q474: embedding separability invariants --------------------------------


def test_q474_scatter_decomposition(spark):
    rows = run(spark, "q474_embedding_separability").collect()
    assert len(rows) >= 2
    # one global CH index, repeated per label row
    assert len({r.ch_index_milli for r in rows}) == 1
    assert rows[0].ch_index_milli >= 0
    # within shares partition the within-scatter (truncating bp)
    share = sum(r.within_share_bp for r in rows)
    assert 10000 - len(rows) <= share <= 10000, share
    for r in rows:
        # unit vectors at e6: per-vector scatter terms are bounded by
        # the squared norm 1e12
        assert 0 <= r.within_mean_e12 <= 10**12
        assert 0 <= r.centroid_sq_e12 <= 10**12
        assert r.n_vectors > 0


# --- q475: bloom sizing curve invariants -------------------------------------


def test_q475_fpr_monotone_and_theory_tracks(spark):
    rows = run(spark, "q475_bloom_sizing_advisor").collect()
    assert len(rows) == 6
    # one bench set, one absent-gram census — constant across the grid
    assert len({r.n_inserted for r in rows}) == 1
    assert len({r.n_absent for r in rows}) == 1
    by = {(r.m_bits, r.k_hashes): r for r in rows}
    # at fixed k, a bigger filter can only lower the measured FPR
    for k in (2, 4):
        fprs = [by[(m, k)].fpr_bp for m in (4096, 16384, 65536)]
        assert fprs == sorted(fprs, reverse=True), fprs
    for r in rows:
        assert 0 <= r.n_false_pos <= r.n_absent
        assert r.fpr_bp == (10000 * r.n_false_pos) // r.n_absent
        assert 0 <= r.theory_bp <= 10000
        assert r.bits_per_key_milli == (1000 * r.m_bits) // r.n_inserted
    # the measurement exists to sit NEXT to the formula: on a hash
    # this uniform the two agree within a small absolute band at the
    # fixture scale (else the md5-slice contract is broken)
    for r in rows:
        assert abs(r.fpr_bp - r.theory_bp) <= max(50, r.theory_bp // 2), (
            r.m_bits,
            r.k_hashes,
            r.fpr_bp,
            r.theory_bp,
        )


# --- q476: watermark lateness curve invariants -------------------------------


def test_q476_drop_curve_monotone_and_bounded(spark):
    rows = run(spark, "q476_watermark_lateness_curve").collect()
    assert [r.delay_s for r in rows] == [60, 300, 900, 1800]
    assert len({r.n_events for r in rows}) == 1
    drops = [r.n_dropped for r in rows]
    # a longer allowed lateness can only drop fewer events
    assert drops == sorted(drops, reverse=True), drops
    # the jitter is bounded by 1800s, so a 1800s watermark delay
    # provably drops NOTHING (the docstring's proof)
    assert drops[-1] == 0
    for r in rows:
        assert r.dropped_bp == (10000 * r.n_dropped) // r.n_events


# --- q477: D4 prototypicality prune invariants -------------------------------


def test_q477_prune_overshoots_target_and_is_monotone(spark):
    rows = run(spark, "q477_prototypicality_prune").collect()
    ps = sorted({r.p_pct for r in rows})
    assert ps == [10, 25, 50]
    # per-cluster rule: 100*cum >= p*n at the threshold bucket ->
    # summed over clusters the GLOBAL drop always reaches the target
    for p in ps:
        tot_n = sum(r.n_vecs for r in rows if r.p_pct == p)
        tot_d = sum(r.n_dropped for r in rows if r.p_pct == p)
        assert 100 * tot_d >= p * tot_n, (p, tot_d, tot_n)
    # per-label monotonicity in p (thresholds only grow with p)
    labels = {r.label for r in rows}
    for lab in labels:
        seq = [r.n_dropped for p in ps for r in rows
               if r.p_pct == p and r.label == lab]
        assert seq == sorted(seq), (lab, seq)
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_vecs
        assert r.drop_bp == (10000 * r.n_dropped) // r.n_vecs


# --- q478: int8 SQ recall invariants -----------------------------------------


def test_q478_recall_structurally_exact(spark):
    rows = run(spark, "q478_sq_int8_recall").collect()
    assert [r.query_id for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        assert 0 <= r.hits <= 10
        assert r.recall_bp == 1000 * r.hits
        # 8 bits/dim on near-unit embeddings is close to lossless;
        # anything under half recall means the dequantize contract broke
        assert r.hits >= 5, (r.query_id, r.hits)


# --- q247 rows-only -> analytic-oracle conversion (r12 wave 3) ---------------


def test_q247_matches_analytic_oracle(spark, duck):
    # The DFT is recomputed in DuckDB from the same pure-function-of-
    # doc_id synthesis; the WAV roundtrip is identity on these samples.
    assert_matches_oracle(spark, duck, "q247_audio_tone_detect")


def test_q247_is_oracle_backed():
    assert QUERIES["q247_audio_tone_detect"].oracle is not None
