"""Round-9 additions: the q423b funnel-input leakage audit and the
round-9 query wave."""
from __future__ import annotations

import sys

import pandas as pd
import pytest
# Oracle-replica / deep-functional suite: excluded from the default
# fast-core gate run (see pytest.ini); run with `-m slow`.
pytestmark = pytest.mark.slow


sys.path.insert(0, "/root/repo")

from tests.conftest import SF_DIR, assert_matches_oracle  # noqa: E402

from ooh_etl_spark.queries import QUERIES  # noqa: E402


def run(spark, name, sf_dir=SF_DIR):
    return QUERIES[name].fn(spark, sf_dir)


def _docs_dir(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    df["doc_id"] = df["doc_id"].astype("int64")
    d = tmp_path / "docs9"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


# --- q423b: funnel-input split-leakage audit ---------------------------------


def test_q423b_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q423b_split_leakage_audit_funnel")


def test_q423b_exact_policy_collapses_to_naive(spark, tmp_path):
    # Post-exact-dedup every text is unique, so the exact-cluster hash
    # policy (b) must coincide with the naive per-doc hash policy (a)
    # BY CONSTRUCTION — and exact-dup pairs must no longer appear in
    # the pair table at all. Build one exact pair + one near pair: the
    # funnel drops the exact pair, leaving exactly the near-dup
    # adjacency for all three policies.
    base = [f"tok{j}" for j in range(12)]
    rows = [
        (1, " ".join(base), "en", "s", 0),
        (2, " ".join(base), "en", "s", 0),  # exact dup of 1 — funnel drops
        (3, " ".join(base[:-1] + ["varX"]), "en", "s", 0),  # near dup of 1
    ]
    out = {
        r["policy"]: r
        for r in run(
            spark, "q423b_split_leakage_audit_funnel", _docs_dir(tmp_path, rows)
        ).collect()
    }
    a, b, c = (
        out["a_naive_hash"],
        out["b_exact_cluster"],
        out["c_neardup_cluster"],
    )
    assert a.n_pairs == b.n_pairs == c.n_pairs == 1  # only the near pair
    assert (a.n_pairs, a.leaked_pairs, a.leak_bp) == (
        b.n_pairs,
        b.leaked_pairs,
        b.leak_bp,
    )
    assert c.leaked_pairs == 0  # component policy never leaks


def test_q423b_funnel_shrinks_pair_table_vs_raw(spark, tmp_path):
    # The scale rationale made executable at test size: replicate a
    # small corpus 3x (the SCALE.md pathology in miniature). The raw
    # audit sees the clique-inflated pair table; the funnel audit sees
    # only the natural near-dup pairs.
    base = [f"w{j}" for j in range(12)]
    texts = [
        " ".join(base),
        " ".join(base[:-1] + ["varA"]),
    ]
    rows = [
        (copy * 10 + i, t, "en", "s", 0)
        for copy in range(3)
        for i, t in enumerate(texts)
    ]
    d = _docs_dir(tmp_path, rows)
    raw = {
        r["policy"]: r
        for r in run(spark, "q423_split_leakage_audit", d).collect()
    }
    fun = {
        r["policy"]: r
        for r in run(spark, "q423b_split_leakage_audit_funnel", d).collect()
    }
    # 6 docs in 1 near-dup component -> C(6,2)=15 raw pairs; funnel
    # keeps 2 docs -> 1 pair.
    assert raw["c_neardup_cluster"].n_pairs == 15
    assert fun["c_neardup_cluster"].n_pairs == 1
    assert fun["c_neardup_cluster"].leaked_pairs == 0


# --- round-9 wave: q425 / q426 / q427 ---------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "q425_bow_fingerprint_dedup",
        "q426_cluster_representatives",
        "q427_minhash_calibration",
        "q428_rouge2_pair_overlap",
        "q429_mergeable_quantile_summary",
        "q430_stopword_gate",
        "q431_shingle_containment",
        "q432_source_js_divergence",
    ],
)
def test_round9_wave_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_q425_reorder_only_dups_detected(spark, tmp_path):
    # doc 2 is a word-order permutation of doc 1 (BOW dup, not exact);
    # doc 3 is a byte-exact copy of doc 1 (both exact and BOW dup);
    # doc 4 is unrelated. Exact dedup keeps 1,2,4; BOW keeps 1,4.
    rows = [
        (1, "alpha beta gamma delta", "en", "s", 0),
        (2, "delta gamma beta alpha", "en", "s", 0),
        (3, "alpha beta gamma delta", "en", "s", 0),
        (4, "totally different words here", "en", "s", 0),
    ]
    out = run(spark, "q425_bow_fingerprint_dedup", _docs_dir(tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 4
    assert r.n_exact_kept == 3  # 1, 2, 4
    assert r.n_bow_kept == 2    # 1, 4
    assert r.reorder_only_dups == 1  # doc 2
    assert r.bow_dup_bp == 5000  # 2 of 4 dropped


def test_q425_token_multiset_not_set(spark, tmp_path):
    # 'a a b' and 'a b b' share the token SET {a,b} but not the
    # multiset — a bag-of-words fingerprint must NOT collide them.
    rows = [
        (1, "a a b", "en", "s", 0),
        (2, "a b b", "en", "s", 0),
    ]
    r = run(spark, "q425_bow_fingerprint_dedup", _docs_dir(tmp_path, rows)).collect()[0]
    assert r.n_bow_kept == 2 and r.reorder_only_dups == 0


def test_q426_rep_is_longest_then_min_id(spark, tmp_path):
    # One near-dup cluster of three; doc 12 has the longest text so it
    # is the representative despite not being the min id. n_chars is
    # derived from the text by _docs_dir.
    base = [f"tok{j}" for j in range(12)]
    rows = [
        (10, " ".join(base), "en", "s1", 0),
        (12, " ".join(base + ["extra", "tail", "words"]), "en", "s2", 0),
        (15, " ".join(base[:-1] + ["varX"]), "en", "s1", 0),
    ]
    out = run(
        spark, "q426_cluster_representatives", _docs_dir(tmp_path, rows)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cluster_id == 10  # min-label component id
    assert r.n_members == 3
    assert r.rep_doc_id == 12  # longest text wins over min id
    assert r.n_sources == 2


def test_q426_rep_tie_breaks_to_min_id(spark, tmp_path):
    # Equal-length members: the tie must deterministically go to the
    # smallest doc_id (the q55 struct-extremum lesson).
    base = [f"w{j}" for j in range(12)]
    rows = [
        (7, " ".join(base), "en", "s", 0),
        (3, " ".join(base), "en", "s", 0),  # exact dup, same length
    ]
    r = run(
        spark, "q426_cluster_representatives", _docs_dir(tmp_path, rows)
    ).collect()[0]
    assert r.rep_doc_id == 3


def test_q427_identical_docs_estimate_exactly_one(spark, tmp_path):
    # A byte-identical pair has true J = 1.0 and identical MinHash
    # signatures: the estimate must be exactly 10000 bp with zero MAE.
    base = [f"u{j}" for j in range(12)]
    rows = [
        (1, " ".join(base), "en", "s", 0),
        (2, " ".join(base), "en", "s", 0),
    ]
    out = run(spark, "q427_minhash_calibration", _docs_dir(tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.bucket_lo_bp == 8000
    assert r.n_pairs == 1
    assert r.mean_true_bp == 10000
    assert r.mean_est_bp == 10000
    assert r.mae_bp == 0 and r.bias_bp == 0


def test_q427_estimate_lands_on_625bp_grid(spark, tmp_path):
    # Partial-overlap pairs: every per-pair estimate is matches/16, so
    # bucket means over one pair must land on the 625-bp grid, and
    # |bias| <= mae always.
    base = [f"v{j}" for j in range(20)]
    rows = [
        (1, " ".join(base), "en", "s", 0),
        (2, " ".join(base[:15] + ["x1", "x2", "x3", "x4", "x5"]), "en", "s", 0),
        (3, " ".join(base[:10] + [f"y{j}" for j in range(10)]), "en", "s", 0),
    ]
    out = run(spark, "q427_minhash_calibration", _docs_dir(tmp_path, rows)).collect()
    assert out, "expected at least one J>=0.2 candidate pair"
    for r in out:
        assert r.bucket_lo_bp in (2000, 4000, 6000, 8000)
        assert 0 <= r.mean_est_bp <= 10000
        assert abs(r.bias_bp) <= r.mae_bp


# --- q428: ROUGE-2 pair overlap ----------------------------------------------


def test_q428_clipped_multiset_not_set(spark, tmp_path):
    # Shared 12-token prefix makes the pair a Jaccard candidate
    # (3-shingle J = 12/17); the suffixes then differ in bigram
    # MULTIPLICITY: doc 1 carries "a b" three times, doc 2 twice.
    # Clipped overlap counts min(3, 2) = 2 for it (a SET measure would
    # say 1; an unclipped product would say 6).
    pre = [f"w{j}" for j in range(12)]
    rows = [
        (1, " ".join(pre + ["a", "b", "a", "b", "a", "b"]), "en", "s", 0),
        (2, " ".join(pre + ["a", "b", "c", "a", "b"]), "en", "s", 0),
    ]
    out = run(spark, "q428_rouge2_pair_overlap", _docs_dir(tmp_path, rows))
    r = out.collect()[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    # shared: 11 prefix bigrams + "w11 a" + min(3,2) of "a b" = 14
    assert r["ovl"] == 14 and r["tot_a"] == 17 and r["tot_b"] == 16
    assert r["rouge2_recall_bp"] == (10000 * 14) // 17
    assert r["rouge2_precision_bp"] == (10000 * 14) // 16
    assert r["rouge2_f1_bp"] == (20000 * 14) // 33


def test_q428_identical_docs_score_10000(spark, tmp_path):
    rows = [
        (1, "x y z w v", "en", "s", 0),
        (2, "x y z w v", "en", "s", 0),
    ]
    r = run(spark, "q428_rouge2_pair_overlap", _docs_dir(tmp_path, rows)).collect()[0]
    assert r["rouge2_f1_bp"] == 10000
    assert r["rouge2_recall_bp"] == 10000 and r["rouge2_precision_bp"] == 10000


def test_q428_below_threshold_pairs_dropped(spark, tmp_path):
    # Disjoint vocabularies -> no shared bigram -> no pair at all
    # (overlap group never forms); near-threshold pair stays out.
    rows = [
        (1, "a b c d e f", "en", "s", 0),
        (2, "p q r s t u", "en", "s", 0),
    ]
    assert (
        run(spark, "q428_rouge2_pair_overlap", _docs_dir(tmp_path, rows)).count()
        == 0
    )


# --- q429: mergeable quantile summary ----------------------------------------


def test_q429_decile_grid_and_rank_error_bound(spark, duck):
    rows = run(spark, "q429_mergeable_quantile_summary", SF_DIR).collect()
    assert [r["decile"] for r in rows] == list(range(1, 10))
    # The merge counts each summary point's covered rows at its
    # UPPER-bound value, so cumw understates the true CDF: the
    # estimate is (a) never below the exact decile and (b) the value
    # at a rank at most N/K + SHARDS above the target (each of the 32
    # shards defers < ns/K rows past the selected point). VALUE error
    # has no a-priori bound (a flat CDF stretch converts rank slack
    # into price slack), which is why the audit reports it.
    duck.execute(
        f"CREATE OR REPLACE VIEW _q429x AS SELECT CAST(round("
        f"l_extendedprice * 100) AS BIGINT) AS cents FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    (n,) = duck.execute("SELECT count(*) FROM _q429x").fetchone()
    slack = n // 16 + 32
    for r in rows:
        assert r["err_cents"] == r["est_cents"] - r["exact_cents"]
        assert r["abs_err_bp"] == (
            10000 * abs(r["err_cents"])
        ) // r["exact_cents"]
        assert r["err_cents"] >= 0  # upward bias only
        hi_rank = min(n, r["target_rank"] + slack)
        (hi_val,) = duck.execute(
            "SELECT cents FROM (SELECT cents, row_number() OVER "
            "(ORDER BY cents) rk FROM _q429x) WHERE rk = ?",
            [hi_rank],
        ).fetchone()
        assert r["est_cents"] <= hi_val
    # deciles are monotone in both columns
    assert all(
        a["exact_cents"] <= b["exact_cents"] and a["est_cents"] <= b["est_cents"]
        for a, b in zip(rows, rows[1:])
    )


def test_q429_exact_matches_global_sort_quantile(spark, duck):
    # independent definition of the exact decile: value at rank
    # ceil(p*N/10) of the fully sorted cents list, computed by a plain
    # ORDER BY in DuckDB.
    got = {
        r["decile"]: r["exact_cents"]
        for r in run(spark, "q429_mergeable_quantile_summary", SF_DIR).collect()
    }
    for p in (1, 5, 9):
        (want,) = duck.execute(
            f"""
            WITH x AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                         AS cents
                       FROM read_parquet('{SF_DIR}/lineitem.parquet')),
                 n AS (SELECT count(*) AS n FROM x)
            SELECT cents FROM (
              SELECT cents, row_number() OVER (ORDER BY cents) AS rk FROM x),
              n
            WHERE rk = (({p} * n.n + 9) // 10) LIMIT 1
            """
        ).fetchone()
        assert got[p] == want


# --- q430: Gopher stopword gate ----------------------------------------------


def test_q430_distinct_hits_not_token_hits(spark, tmp_path):
    # doc 1: "the the the ..." — many stop TOKENS but only ONE distinct
    # stop word -> FAILS the >=2-distinct rule; doc 2 has two distinct
    # stopwords exactly once each -> passes.
    rows = [
        (1, "the the the the rock", "en", "s", 0),
        (2, "of stone and rock here", "en", "s", 0),
    ]
    r = run(spark, "q430_stopword_gate", _docs_dir(tmp_path, rows)).collect()[0]
    assert r["n_docs"] == 2
    assert r["n_pass"] == 1 and r["n_fail_stopword"] == 1
    # stop tokens: 4x"the" + "of" + "and" = 6 of 10 tokens
    assert r["n_stop_tokens"] == 6 and r["n_tokens"] == 10
    assert r["stop_density_bp"] == (10000 * 6) // 10


def test_q430_consecutive_stopwords_all_counted(spark, tmp_path):
    # regexp token counting consumes only the LEADING separator, so a
    # run "of the and that" counts every one of them.
    rows = [(1, "of the and that", "en", "s", 0)]
    r = run(spark, "q430_stopword_gate", _docs_dir(tmp_path, rows)).collect()[0]
    assert r["n_stop_tokens"] == 4 and r["n_tokens"] == 4
    assert r["n_pass"] == 1


# --- q431: shingle containment -----------------------------------------------


def test_q431_containment_catches_what_jaccard_misses(spark, tmp_path):
    # doc 2 is doc 1 plus a long unrelated tail: every shingle of the
    # short doc appears in the long one (containment = 1.0) while
    # Jaccard is diluted far below the 0.5 dedup threshold.
    short = [f"tok{j}" for j in range(8)]
    tail = [f"zz{j}" for j in range(40)]
    rows = [
        (1, " ".join(short), "en", "s", 0),
        (2, " ".join(short + tail), "en", "s", 0),
    ]
    out = run(spark, "q431_shingle_containment", _docs_dir(tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["contained_id"] == 1
    assert r["containment_bp"] == 10000
    assert r["jaccard_bp"] < 5000
    assert r["sz_a"] == 6 and r["sz_b"] == 46  # 3-shingle set sizes


def test_q431_tie_sizes_contained_is_id_a(spark, tmp_path):
    base = [f"w{j}" for j in range(12)]
    rows = [
        (5, " ".join(base), "en", "s", 0),
        (9, " ".join(base), "en", "s", 0),
    ]
    r = run(spark, "q431_shingle_containment", _docs_dir(tmp_path, rows)).collect()[0]
    assert (r["id_a"], r["id_b"], r["contained_id"]) == (5, 9, 5)


# --- q432: per-source JS divergence ------------------------------------------


def test_q432_identical_sources_have_zero_js(spark, tmp_path):
    # two sources with the SAME token distribution -> each equals the
    # pooled corpus -> JS = 0 and no corpus mass is absent.
    rows = [
        (1, "a b c d", "en", "s1", 0),
        (2, "a b c d", "en", "s2", 0),
    ]
    out = run(spark, "q432_source_js_divergence", _docs_dir(tmp_path, rows)).collect()
    assert [r["source"] for r in out] == ["s1", "s2"]
    for r in out:
        assert r["js_milli"] == 0 and r["absent_mass_bp"] == 0
        assert r["n_tokens"] == 4 and r["vocab"] == 4


def test_q432_disjoint_source_approaches_one_bit(spark, tmp_path):
    # a source sharing NO tokens with the rest of the corpus: as its
    # share of the pool shrinks, JS(p, corpus) -> 1 bit. With a 50/50
    # split JS = 1 - 0.5*log2(4/3)... compute the closed form instead:
    # p uniform on {a,b}, corpus = 0.5*p + 0.5*q with q uniform on
    # {x,y}: JS(p, corpus) here is KL terms with q_t = 1/4 for all.
    rows = [
        (1, "a b a b", "en", "s1", 0),
        (2, "x y x y", "en", "s2", 0),
    ]
    out = {r["source"]: r for r in run(
        spark, "q432_source_js_divergence", _docs_dir(tmp_path, rows)
    ).collect()}
    import math
    # p_t = 1/2 (2 tokens), corpus q_t = 1/4 (4 tokens, each source
    # holds half the pool mass). JS = 0.5*sum[p log2(2p/(p+q))]
    #   + 0.5*(sum_present[q log2(2q/(p+q))] + absent_mass)
    p, q = 0.5, 0.25
    js = 0.5 * (2 * p * math.log2(2 * p / (p + q))) + 0.5 * (
        2 * q * math.log2(2 * q / (p + q)) + 0.5
    )
    for r in out.values():
        assert r["absent_mass_bp"] == 5000  # half the corpus mass absent
        assert r["js_milli"] == round(1000 * js)


# --- q151c: SemDeDup behind exact vector dedup --------------------------------


def _emb_dir(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    d = tmp_path / "emb9"
    d.mkdir(exist_ok=True)
    pq.write_table(t, d / "embeddings.parquet")
    return str(d)


def test_q151c_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q151c_semdedup_funnel")


def test_q151c_replicated_vectors_collapse_to_base_output(spark, tmp_path):
    # The SCALE.md pathology in miniature: 3 byte-identical copies of
    # each base vector (new ids). The funnel form's output on the
    # replicated corpus must equal its output on the base corpus —
    # duplicate concentration never reaches the clustering stage.
    import math

    base = []
    for i in range(12):
        v = [math.cos(0.7 * i + 0.1 * j) for j in range(8)]
        base.append((i, v))
    rep = [(i + 100 * (c + 1), v) for c in range(2) for i, v in base]
    out_base = run(
        spark, "q151c_semdedup_funnel", _emb_dir(tmp_path, base)
    ).collect()
    d2 = tmp_path / "r2"
    d2.mkdir()
    out_rep = run(
        spark,
        "q151c_semdedup_funnel",
        _emb_dir(d2, base + rep),
    ).collect()
    assert sorted(map(tuple, out_rep)) == sorted(map(tuple, out_base))


def test_q151c_equals_q151_on_unique_corpus(spark, tmp_path):
    # On an already-unique corpus the funnel stage is a no-op: both
    # entries must emit identical rows.
    import math

    rows = [
        (i, [math.sin(0.3 * i + 0.2 * j) for j in range(8)])
        for i in range(15)
    ]
    d = _emb_dir(tmp_path, rows)
    a = sorted(map(tuple, run(spark, "q151_semdedup", d).collect()))
    b = sorted(map(tuple, run(spark, "q151c_semdedup_funnel", d).collect()))
    assert a == b


# --- q27b: jaccard pairs behind the exact-dedup funnel -----------------------


def test_q27b_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q27b_jaccard_pairs_funnel")


def test_q27b_funnel_drops_clique_inflation(spark, tmp_path):
    # 3x-replicated corpus: raw q27 sees the full clique of exact
    # copies; the funnel form sees only the natural near-dup pair.
    base = [f"w{j}" for j in range(12)]
    texts = [" ".join(base), " ".join(base[:-1] + ["varA"])]
    rows = [
        (copy * 10 + i, t, "en", "s", 0)
        for copy in range(3)
        for i, t in enumerate(texts)
    ]
    d = _docs_dir(tmp_path, rows)
    assert run(spark, "q27_jaccard_pairs", d).count() == 15  # C(6,2)
    fun = run(spark, "q27b_jaccard_pairs_funnel", d).collect()
    assert [(r.id_a, r.id_b) for r in fun] == [(0, 1)]


def test_q27b_equals_q27_on_unique_corpus(spark, tmp_path):
    base = [f"t{j}" for j in range(12)]
    rows = [
        (1, " ".join(base), "en", "s", 0),
        (2, " ".join(base[:-1] + ["varB"]), "en", "s", 0),
        (3, " ".join(f"z{j}" for j in range(12)), "en", "s", 0),
    ]
    d = _docs_dir(tmp_path, rows)
    a = sorted(map(tuple, run(spark, "q27_jaccard_pairs", d).collect()))
    b = sorted(map(tuple, run(spark, "q27b_jaccard_pairs_funnel", d).collect()))
    assert a == b


# --- round-10 ADVICE regressions ---------------------------------------------


def test_q428_single_token_doc_does_not_crash(spark, tmp_path):
    # ADVICE r9 (medium): sequence(1, size-1) with size=1 DESCENDS to
    # [1, 0] and toks[1] raises under Spark 4 ANSI mode. A 1-token doc
    # has zero bigrams: it must contribute nothing, not crash.
    rows = [
        (1, "solo", "en", "s", 0),
        (2, "alpha beta gamma delta alpha beta gamma delta", "en", "s", 0),
        (3, "alpha beta gamma delta alpha beta gamma echo", "en", "s", 0),
    ]
    out = run(spark, "q428_rouge2_pair_overlap", _docs_dir(tmp_path, rows)).collect()
    ids = {(r["id_a"], r["id_b"]) for r in out}
    assert all(1 not in pair for pair in ids)


def test_q432_null_text_row_contributes_nothing(spark, tmp_path):
    # ADVICE r9 (low): explode_outer on a NULL text would emit one
    # null-token row that DuckDB's unnest never does; the post-explode
    # filter must keep per-source masses identical to the no-null run.
    rows_base = [
        (1, "aa bb cc dd", "en", "s1", 0),
        (2, "aa bb cc ee", "en", "s2", 0),
    ]
    base = {
        r["source"]: r["n_tokens"]
        for r in run(
            spark, "q432_source_js_divergence", _docs_dir(tmp_path, rows_base)
        ).collect()
    }
    import pandas as pd

    df = pd.DataFrame(
        rows_base + [(3, None, "en", "s1", 0)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    df["n_chars"] = 0
    d = tmp_path / "docs_null"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "documents.parquet", index=False)
    withnull = {
        r["source"]: r["n_tokens"]
        for r in run(spark, "q432_source_js_divergence", str(d)).collect()
    }
    assert withnull == base


def test_jaccard_pairs_rejects_null_threshold_without_raw_counts(spark):
    # ADVICE r9 (low): threshold=None + raw_counts=False would filter
    # on NULL and silently return an empty frame.
    import pytest as _pytest

    from ooh_etl_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="raw_counts"):
        jaccard_pairs(df, "text", "doc_id", threshold=None)
