"""Round-11 additions: q334b, the LSH-candidate mutual-NN funnel
(VERDICT r10 item 4 — the last all-pairs disposition without a
registered machine-checked cure of itself)."""
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


def run(spark, name, sf_dir=SF_DIR):
    return QUERIES[name].fn(spark, sf_dir)


def _emb_dir(tmp_path, vectors):
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(vectors), dtype="int64"),
            "embedding": [np.asarray(v, dtype="float32") for v in vectors],
            "label": np.zeros(len(vectors), dtype="int32"),
        }
    )
    d = tmp_path / "emb11"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def test_q334b_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q334b_mutual_nn_funnel")


def test_q334b_equals_q334_when_recall_is_total(spark, tmp_path):
    # The funnel-variant contract (q27b/q151c/q423b/q191b discipline):
    # when every true-best pair is GUARANTEED to collide in >=1 band,
    # the candidate argmaxes equal the global argmaxes, so q334b must
    # equal q334 row for row. Guarantee by construction: odd vector
    # 2i+1 IS even vector 2i (identical input -> identical
    # deterministic bucket in EVERY band -> collision certain, and its
    # cosine is the global maximum 1e6 with all cross-pair cosines
    # strictly below by well-separated random bases).
    rng = np.random.RandomState(11)
    bases = rng.standard_normal((10, 64))
    vecs = []
    for i in range(10):
        vecs.append(bases[i])  # vec_id 2i (even side)
        vecs.append(bases[i])  # vec_id 2i+1 (odd side, identical)
    d = _emb_dir(tmp_path, vecs)
    exact = sorted(map(tuple, run(spark, "q334_mutual_nn_pairs", d).collect()))
    funnel = sorted(
        map(tuple, run(spark, "q334b_mutual_nn_funnel", d).collect())
    )
    assert len(exact) == 10  # every constructed pair is mutual
    assert funnel == exact


def test_q125_matches_golden_oracle(spark, duck):
    # VERDICT r10 item 6: zlib census vs the pure-Python reference
    # (tools/make_golden.py), pinned as a guard-gated VALUES oracle.
    assert_matches_oracle(spark, duck, "q125_compression_quality")


def test_q185_matches_golden_oracle(spark, duck):
    # k-core fixpoint vs the pure-Python set-based peel reference.
    assert_matches_oracle(spark, duck, "q185_k_core")


def test_golden_oracles_are_guard_gated():
    # A golden VALUES oracle is only valid at its pinned corpora; the
    # guard + two-signature domain is what lets the 5x sweep fall back
    # to rows-only instead of failing on unpinned replicas.
    for name in ("q125_compression_quality", "q185_k_core"):
        spec = QUERIES[name]
        assert spec.oracle is not None
        assert spec.golden_guard is not None
        assert spec.golden_domain is not None and len(spec.golden_domain) == 2


def test_q334b_is_subset_of_exact_candidates(spark):
    # On the real fixture the funnel's recall is < 1 by design, but
    # every pair it DOES emit must carry the exact cosine and appear
    # with the same score in q334's full-cross-product mutual set
    # only if both argmaxes agree — the safe invariant is on scores:
    # each (id_a, id_b) the funnel emits has the same cos_e6 the exact
    # scorer assigns (verification is exact, never approximate).
    exact = {
        (r["id_a"], r["id_b"]): r["cos_e6"]
        for r in run(spark, "q334_mutual_nn_pairs").collect()
    }
    for r in run(spark, "q334b_mutual_nn_funnel").collect():
        k = (r["id_a"], r["id_b"])
        if k in exact:
            assert r["cos_e6"] == exact[k]


# --- r11 new-query wave: oracle fidelity at SF_DIR ---------------------------


def test_q440_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q440_diversity_coefficient")


def test_q441_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q441_source_overlap_matrix")


def test_q442_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q442_softdedup_weights")


def test_q443_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q443_char_entropy_gate")


def test_q444_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q444_bloom_decontaminate")


def test_q445_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q445_packing_efficiency")


def test_q446_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q446_pq_adc_recall")


def test_q447_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q447_temperature_mixture_curve")


# --- semantic pins ------------------------------------------------------------


def test_q440_identical_vs_orthogonal_groups(spark, tmp_path):
    # label 0: 4 identical vectors -> mean pairwise cos = 1e6 exactly,
    # diversity 0. label 1: 4 pairwise-orthogonal basis vectors ->
    # mean cos 0, diversity 1e6.
    same = np.zeros(64); same[0] = 1.0
    vecs, labels = [], []
    for _ in range(4):
        vecs.append(same); labels.append(0)
    for i in range(4):
        e = np.zeros(64); e[i + 1] = 1.0
        vecs.append(e); labels.append(1)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(8, dtype="int64"),
            "embedding": [np.asarray(v, dtype="float32") for v in vecs],
            "label": np.asarray(labels, dtype="int32"),
        }
    )
    d = tmp_path / "emb440"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "embeddings.parquet", index=False)
    out = {
        r["label"]: r
        for r in run(spark, "q440_diversity_coefficient", str(d)).collect()
    }
    assert out[0]["mean_cos_e6"] == 1000000 and out[0]["diversity_e6"] == 0
    assert out[1]["mean_cos_e6"] == 0 and out[1]["diversity_e6"] == 1000000


def test_q441_containment_vs_jaccard(spark, tmp_path):
    # source B's grams are a strict subset of A's -> containment 100%,
    # Jaccard < 100%.
    a_text = "w1 w2 w3 w4 w5 w6 w7 w8"  # grams: 6
    b_text = "w1 w2 w3 w4 w5"  # grams: 3, all inside A's
    rows = [(1, a_text, "en", "a", 0), (2, b_text, "en", "b", 0)]
    out = run(spark, "q441_source_overlap_matrix", _docs_dir2(tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("a", "b")
    assert r["n_shared"] == 3 and r["containment_bp"] == 10000
    assert r["jaccard_bp"] == 10000 * 3 // 6


def test_q442_duplicates_downweight(spark, tmp_path):
    # source 'dup' holds two identical docs; 'uniq' two disjoint docs.
    # Every dup gram has corpus frequency 2 -> w = 500 milli ->
    # downweight 5000bp; every uniq gram is unique -> w = 1000, 0bp.
    rows = [
        (1, "aa bb cc dd ee", "en", "dup", 0),
        (2, "aa bb cc dd ee", "en", "dup", 0),
        (3, "ff gg hh ii jj", "en", "uniq", 0),
        (4, "kk ll mm nn oo", "en", "uniq", 0),
    ]
    out = {
        r["source"]: r
        for r in run(spark, "q442_softdedup_weights", _docs_dir2(tmp_path, rows)).collect()
    }
    assert out["dup"]["downweight_bp"] == 5000
    assert out["uniq"]["downweight_bp"] == 0


def test_q443_flags_low_entropy(spark, tmp_path):
    rows = [
        (1, "aaaaaaaaaaaaaaaaaaaaaaaa", "en", "junk", 0),  # H = 0 bits
        (2, "the quick brown fox jumps over the lazy dog", "en", "prose", 0),
    ]
    out = {
        r["source"]: r
        for r in run(spark, "q443_char_entropy_gate", _docs_dir2(tmp_path, rows)).collect()
    }
    assert out["junk"]["n_low_entropy"] == 1
    assert out["junk"]["mean_entropy_e6"] == 0
    assert out["prose"]["n_low_entropy"] == 0
    assert out["prose"]["mean_entropy_e6"] > 3000000  # prose ~4 bits/char


def test_q444_exact_contamination_is_bloom_flagged(spark, tmp_path):
    # doc 97 (97 % 97 == 0) is the benchmark; doc 1 repeats its text ->
    # every gram exact-hits, so it must be flagged by BOTH paths (a
    # bloom never false-negatives); doc 2 is clean prose.
    bench = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (97, bench, "en", "b", 0),
        (1, bench, "en", "c", 0),
        (2, "one two three four five six seven eight", "en", "c", 0),
    ]
    out = {
        r["source"]: r
        for r in run(spark, "q444_bloom_decontaminate", _docs_dir2(tmp_path, rows)).collect()
    }
    c = out["c"]
    assert c["n_flagged_exact"] == 1
    assert c["n_flagged_bloom"] >= 1  # superset of exact, never below
    assert c["n_false_positive"] == c["n_flagged_bloom"] - c["n_flagged_exact"]


def test_q445_pad_and_fragment_arithmetic(spark, tmp_path):
    # 130 tokens at L=128: pad waste 126, doc crosses one boundary,
    # concat needs 2 chunks.
    text = " ".join(f"t{i}" for i in range(130))
    rows = [(1, text, "en", "s", 0)]
    r = run(spark, "q445_packing_efficiency", _docs_dir2(tmp_path, rows)).collect()[0]
    assert r["n_tokens"] == 130
    assert r["pad_waste_tokens"] == 126
    assert r["n_fragmented_docs"] == 1
    assert r["n_chunks"] == 2


def test_q446_recall_is_exact_ratio(spark):
    for r in run(spark, "q446_pq_adc_recall").collect():
        assert 0 <= r["hits"] <= 10
        assert r["recall_bp"] == 10000 * r["hits"] // 10


def test_q447_higher_tau_flattens_weights(spark):
    rows = run(spark, "q447_temperature_mixture_curve").collect()
    by_tau = {}
    for r in rows:
        by_tau.setdefault(r["tau_milli"], []).append(r["weight_bp"])
    for tau, ws in by_tau.items():
        assert abs(sum(ws) - 10000) <= len(ws)  # truncation slack
    assert max(by_tau[1000]) >= max(by_tau[3330])  # hotter = flatter
    assert min(by_tau[1000]) <= min(by_tau[3330])


def _docs_dir2(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    df["doc_id"] = df["doc_id"].astype("int64")
    d = tmp_path / "docs11"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


# --- r11 wave 2: q448-q450 ----------------------------------------------------


def test_q448_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q448_domain_affinity_matrix")


def test_q449_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q449_partition_skew_audit")


def test_q450_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q450_norm_dedup_ladder")


def test_q448_self_entropy_is_lowest_for_twin_sources(spark, tmp_path):
    # Two sources with DISJOINT vocabularies: each source's stream must
    # be cheaper (lower cross-entropy) under its own LM than under the
    # other's, where every bigram is unseen.
    rows = [
        (1, "aa bb cc aa bb cc aa bb", "en", "s1", 0),
        (2, "aa bb cc aa bb cc aa cc", "en", "s1", 0),
        (3, "xx yy zz xx yy zz xx yy", "en", "s2", 0),
        (4, "xx yy zz xx yy zz xx zz", "en", "s2", 0),
    ]
    out = {
        (r["train_source"], r["eval_source"]): r["xent_milli_nats"]
        for r in run(
            spark, "q448_domain_affinity_matrix", _docs_dir2(tmp_path, rows)
        ).collect()
    }
    assert out[("s1", "s1")] < out[("s2", "s1")]
    assert out[("s2", "s2")] < out[("s1", "s2")]


def test_q449_salting_cures_source_skew(spark):
    out = {
        r["policy"]: r
        for r in run(spark, "q449_partition_skew_audit").collect()
    }
    # 20 sources into 32 shards: by_source uses at most 20 shards and
    # carries structural skew; salting multiplies the key domain by 8
    # and must strictly reduce the max shard.
    assert out["by_source"]["shards_used"] <= 20
    assert (
        out["by_source_salt8"]["max_shard_rows"]
        < out["by_source"]["max_shard_rows"]
    )
    assert out["by_source_salt8"]["skew_bp"] < out["by_source"]["skew_bp"]
    assert out["by_doc"]["skew_bp"] < out["by_source"]["skew_bp"]


def test_q450_yield_is_monotone_down_the_ladder(spark, tmp_path):
    # 'A  b' and 'a b' collide only after ws-collapse; 'a-b' and 'ab'
    # only after alnum-stripping... construct one new dup per rung.
    rows = [
        (1, "alpha beta", "en", "s", 0),
        (2, "alpha beta", "en", "s", 0),         # raw dup
        (3, "Alpha Beta", "en", "s", 0),         # joins at lower_trim
        (4, "alpha  beta", "en", "s", 0),        # joins at ws_collapse
        (5, "alpha, beta", "en", "s", 0),        # joins at alnum_only
        (6, "unique text here", "en", "s", 0),
    ]
    out = {
        r["rung"]: r["n_removed"]
        for r in run(spark, "q450_norm_dedup_ladder", _docs_dir2(tmp_path, rows)).collect()
    }
    assert out[0] == 1 and out[1] == 2 and out[2] == 3 and out[3] == 4


# --- r11 wave 3: q451-q455 ----------------------------------------------------


def test_q451_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q451_lsh_scurve_recall")


def test_q452_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q452_join_strategy_advisor")


def test_q453_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q453_doremi_mixture_step")


def test_q454_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q454_dedup_scope_census")


def test_q455_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q455_deleted_interpolation")


def test_q451_grid_is_exact_scurve():
    # The inlined literal grid IS 1 - (1 - s^r)^b: spot-check against
    # float math away from rounding boundaries, and pin the exact
    # endpoints (s=1 collides always; the grid is monotone in s for
    # every config — the S in S-curve).
    from ooh_etl_spark.queries.dedup import _SCURVE_CONFIGS, _scurve_rows

    rows = _scurve_rows()
    by_cfg = {}
    for b, r, i, p in rows:
        by_cfg.setdefault((b, r), []).append((i, p))
    assert set(by_cfg) == set(_SCURVE_CONFIGS)
    for (b, r), pts in by_cfg.items():
        pts.sort()
        assert pts[-1] == (20, 10000)  # s = 1.0 -> certain collision
        assert [p for _, p in pts] == sorted(p for _, p in pts)  # monotone
        for i, p in pts:
            s = i / 20
            expect = 1 - (1 - s**r) ** b
            assert abs(p - 10000 * expect) <= 1.0


def test_q451_identical_docs_expect_full_recall(spark, tmp_path):
    # Two identical docs land in Jaccard bucket 20 where every (b, r)
    # config has p = 10000 bp: expected recall of the observed pair
    # population is exactly 100% for all four configs.
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "srcA", 0),
        (1, "alpha beta gamma delta epsilon zeta", "en", "srcA", 0),
        (2, "totally different words here now yes", "en", "srcB", 0),
    ]
    out = run(spark, "q451_lsh_scurve_recall", _docs_dir2(tmp_path, rows)).collect()
    assert len(out) == 4
    for r in out:
        assert r.n_pairs == 1
        assert r.exp_recall_bp == 10000


def test_q452_fk_joins_estimate_left_rows(spark):
    # For a foreign-key join the PK side has distinct == rows, so the
    # System-R estimate |L|*|R|/max(dL,dR) collapses to exactly |L| —
    # the advisor must reproduce the textbook identity on all three
    # TPC-H FK joins (and pick broadcast at fixture scale).
    for r in run(spark, "q452_join_strategy_advisor").collect():
        assert r.right_keys == r.right_rows  # PK side
        assert r.est_out_rows == r.left_rows
        assert r.strategy == "broadcast_right"
        assert r.shuffled_rows == 0
        assert r.broadcast_rows == r.right_rows


def test_q453_rare_vocab_source_is_upweighted(spark, tmp_path):
    # A source whose tokens are globally rare has positive excess loss
    # under the pooled LM and must gain mixture weight; the stock
    # source loses. Token masses are equal so w_old is 5000/5000.
    common = " ".join(["the"] * 12)
    rare = " ".join(f"xq{i}" for i in range(12))
    rows = [
        (0, common, "en", "stock", 0),
        (1, common, "en", "stock", 0),
        (2, rare, "en", "novel", 0),
        (3, " ".join(f"zq{i}" for i in range(12)), "en", "novel", 0),
    ]
    out = {
        r.source: r
        for r in run(
            spark, "q453_doremi_mixture_step", _docs_dir2(tmp_path, rows)
        ).collect()
    }
    assert out["stock"].w_old_bp == out["novel"].w_old_bp
    assert out["novel"].excess_micro > 0 > out["stock"].excess_micro
    assert out["novel"].w_new_bp > out["novel"].w_old_bp
    assert out["stock"].w_new_bp < out["stock"].w_old_bp


def test_q454_scope_split(spark, tmp_path):
    # srcA doc1 duplicates srcA doc0 (within); srcB doc2 duplicates
    # srcA doc0 (cross-source only: B's own pass keeps it, the global
    # pass removes it); doc3 is unique.
    rows = [
        (0, "dup text body", "en", "srcA", 0),
        (1, "dup text body", "en", "srcA", 0),
        (2, "dup text body", "en", "srcB", 0),
        (3, "unique text body", "en", "srcB", 0),
    ]
    out = {
        r.source: r
        for r in run(
            spark, "q454_dedup_scope_census", _docs_dir2(tmp_path, rows)
        ).collect()
    }
    a, b = out["srcA"], out["srcB"]
    assert (a.removed_within, a.removed_global, a.removed_cross_only) == (1, 1, 0)
    assert (b.removed_within, b.removed_global, b.removed_cross_only) == (0, 1, 1)


def test_q455_lambda_moves_with_bigram_coverage(spark, tmp_path):
    # Held-out bigrams fully covered by training -> responsibilities
    # near 1 -> lambda rises well above 750. Disjoint-vocab held-out
    # (no trained bigram fires) -> responsibilities 0 -> lambda 0.
    # doc_ids are chosen for the md5-parity split: parity(0)=0,
    # parity(1)=0 (train side); parity(2)=1, parity(4)=1 (held side).
    covered = "a b a b a b a b a b"
    for needle, expect_high in ((covered, True), ("p q p q r s r s", False)):
        rows = [
            (0, covered, "en", "s", 0),   # train (parity 0)
            (1, covered, "en", "s", 0),   # train (parity 0)
            (2, needle if expect_high else "zz yy zz yy xx ww", "en", "s", 0),
            (4, needle if expect_high else "vv uu vv uu tt ss", "en", "s", 0),
        ]
        out = run(
            spark, "q455_deleted_interpolation", _docs_dir2(tmp_path, rows)
        ).collect()
        assert len(out) == 1
        lam = out[0].lambda1_milli
        if expect_high:
            # 2-token vocab caps p_uni at ~1/2 -> resp <= 6/7 = 857 milli
            assert lam > 800
            assert out[0].seen_bigram_bp == 10000
        else:
            assert lam == 0
            assert out[0].seen_bigram_bp == 0


# --- r11 wave 4: q456-q457 ----------------------------------------------------


def test_q456_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q456_semdedup_k_curve")


def test_q457_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q457_stop_shingle_ablation")


def test_q456_inertia_monotone_and_accounting(spark):
    # The K grid is NESTED (first-2 subset of first-4 ...), so each
    # vector's min distance can only fall as K grows: inertia is
    # monotone non-increasing in K. Accounting: every vector assigned
    # at every K; clusters_used <= k.
    out = sorted(run(spark, "q456_semdedup_k_curve").collect(), key=lambda r: r.k)
    n = out[0].n_vecs
    last = None
    for r in out:
        assert r.n_vecs == n
        assert r.clusters_used <= r.k
        assert r.max_cluster <= r.n_vecs
        if last is not None:
            assert r.inertia_e6 <= last
        last = r.inertia_e6


def test_q456_zero_inertia_when_vectors_are_centroids(spark, tmp_path):
    # 2 distinct unit vectors, each duplicated: with K >= 2 every
    # vector IS one of the first-2 centroids -> inertia exactly 0, and
    # the two clusters split 2/2 (candidate_pairs = 1 + 1 = 2).
    e0 = np.zeros(8); e0[0] = 1.0
    e1 = np.zeros(8); e1[1] = 1.0
    d = _emb_dir(tmp_path, [e0, e1, e0, e1])
    for r in run(spark, "q456_semdedup_k_curve", d).collect():
        assert r.inertia_e6 == 0
        if r.k >= 2:
            assert r.clusters_used == 2
            assert r.candidate_pairs == 2


def test_q457_uncapped_covers_everything(spark):
    # A true pair has jaccard >= 0.5 > 0, so it shares >= 1 shingle;
    # with the sentinel cap every shared shingle survives ->
    # coverage_bp == 10000. Candidate volume and kept shingles are
    # monotone non-increasing as the cap tightens.
    out = sorted(
        run(spark, "q457_stop_shingle_ablation").collect(),
        key=lambda r: -r.cap_df,
    )
    assert out[0].cap_df == 1000000000
    assert out[0].coverage_bp == 10000
    for prev, cur in zip(out, out[1:]):
        assert cur.n_shingles_kept <= prev.n_shingles_kept
        assert cur.candidate_pairs <= prev.candidate_pairs
        assert cur.covered_true_pairs <= prev.covered_true_pairs


def test_q457_hot_shingle_dropped_pair_survives(spark, tmp_path):
    # Docs 0/1 are identical (a true pair; their shingles have df=2).
    # 20 filler docs all share one hot template shingle (df=20) and
    # nothing else. At cap 16 the hot shingle is dropped: candidate
    # volume collapses from C(20,2)+rare to rare-only, while the true
    # pair stays covered through its rare df=2 shingles.
    pair = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(0, pair, "en", "s", 0), (1, pair, "en", "s", 0)]
    for i in range(20):
        rows.append((2 + i, f"hot template shingle u{i} v{i} w{i}", "en", "s", 0))
    out = {
        r.cap_df: r
        for r in run(
            spark, "q457_stop_shingle_ablation", _docs_dir2(tmp_path, rows)
        ).collect()
    }
    unc, capped = out[1000000000], out[16]
    assert unc.true_pairs == 1 and unc.covered_true_pairs == 1
    assert capped.covered_true_pairs == 1  # rare shingles carry the pair
    assert capped.candidate_pairs < unc.candidate_pairs  # hot list gone


def test_q458_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q458_ivf_centroid_drift")


def test_q458_accounting(spark):
    from ooh_etl_spark.tables import load_table

    out = run(spark, "q458_ivf_centroid_drift").collect()
    n_corpus = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_vecs for r in out) == n_corpus  # every vector assigned once
    for r in out:
        assert r.cell_old % 2 == 0 and r.cell_old < 16  # old-panel ids
        assert 0 <= r.n_moved <= r.n_vecs
        assert r.moved_bp == 10000 * r.n_moved // r.n_vecs


def test_q458_zero_churn_when_panels_agree(spark, tmp_path):
    # Construct a corpus where both panels resolve to the SAME
    # (cid -> vector) map: basis vectors live at the shared even ids
    # 0/2/4/6; every other id (including the panels' non-shared
    # members 1,3,5,7 and 8,10,12,14) is an exact copy of one basis,
    # so each vector's argmin ties at d2=0 and breaks to the shared
    # smallest cid under BOTH panels -> zero movement everywhere.
    basis = []
    for i in range(4):
        e = np.zeros(16); e[i] = 1.0
        basis.append(e)
    vecs = []
    for vid in range(24):
        vecs.append(basis[(vid // 2) % 4] if vid % 2 == 0 or vid < 8 else basis[vid % 4])
    # make ids 0/2/4/6 the four distinct bases explicitly
    for j in range(4):
        vecs[2 * j] = basis[j]
    d = _emb_dir(tmp_path, vecs)
    for r in run(spark, "q458_ivf_centroid_drift", d).collect():
        assert r.n_moved == 0 and r.moved_bp == 0
