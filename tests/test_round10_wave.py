"""Round-10 additions: the q191b degree-capped link-prediction scale
cure (VERDICT r9 item 3) and its funnel-discipline equality pins."""
from __future__ import annotations

import pytest

# Oracle-replica / deep-functional suite: excluded from the default
# fast-core gate run (see pytest.ini); run with `-m slow`.
pytestmark = pytest.mark.slow

import sys

import pandas as pd

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
    d = tmp_path / "docs10"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _lineitem_dir(tmp_path, pairs):
    """Write a minimal lineitem parquet of (l_orderkey, l_partkey)."""
    df = pd.DataFrame(pairs, columns=["l_orderkey", "l_partkey"])
    df["l_orderkey"] = df["l_orderkey"].astype("int64")
    df["l_partkey"] = df["l_partkey"].astype("int64")
    d = tmp_path / "li10"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "lineitem.parquet", index=False)
    return str(d)


# --- q191b: degree-capped link prediction ------------------------------------


def test_q191b_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q191b_link_prediction_capped")


def test_q191b_equals_q191_on_capfree_graph(spark, tmp_path):
    # The q27b/q151c funnel-variant contract: when every node's degree
    # is below the cap (K=32), the capped adjacency IS the full
    # adjacency, so q191b must equal q191 row for row. 12 orders over
    # 15 parts, 3 parts per order -> max degree <= 14.
    pairs = [
        (o, p)
        for o in range(12)
        for p in ((o * 5) % 15, (o * 5 + 1) % 15, (o * 7 + 3) % 15)
    ]
    d = _lineitem_dir(tmp_path, pairs)
    base = sorted(map(tuple, run(spark, "q191_link_prediction", d).collect()))
    capped = sorted(
        map(tuple, run(spark, "q191b_link_prediction_capped", d).collect())
    )
    assert capped == base
    assert len(base) > 0


def test_q191b_cap_bites_on_hub_and_only_lowers_scores(spark, tmp_path):
    # One hub order with 40 parts (degree 39 > K=32) plus a few small
    # orders. The cap must (a) bound each center's wedge fan-out and
    # (b) never RAISE a pair's common-neighbor count or score: for any
    # pair in both outputs, capped common_n <= exact common_n and
    # capped jacc_ppm <= exact jacc_ppm (degrees stay exact).
    pairs = [(1, p) for p in range(40)]
    pairs += [(2, p) for p in (0, 1, 2)]
    pairs += [(3, p) for p in (0, 5, 6)]
    d = _lineitem_dir(tmp_path, pairs)
    exact = {
        (r["part_a"], r["part_b"]): r
        for r in run(spark, "q191_link_prediction", d).collect()
    }
    capped = {
        (r["part_a"], r["part_b"]): r
        for r in run(spark, "q191b_link_prediction_capped", d).collect()
    }
    assert capped, "capped variant returned nothing on the hub graph"
    overlap = set(exact) & set(capped)
    assert overlap, "no shared pairs to compare"
    for k in overlap:
        assert capped[k]["common_n"] <= exact[k]["common_n"]
        assert capped[k]["jacc_ppm"] <= exact[k]["jacc_ppm"]


# --- round-10 wave: oracle + property pins -----------------------------------

import pytest  # noqa: E402


@pytest.mark.parametrize(
    "name",
    [
        "q433_dsir_importance",
        "q434_bm25_hard_negatives",
        "q435_token_budget_epochs",
        "q436_link_topk_per_node",
        "q437_ivf_recall_curve",
        "q31b_ann_lsh_det",
        "q438_wimbd_ngram_census",
    ],
)
def test_round10_wave_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_q433_target_like_doc_outscores_raw_like(spark, tmp_path):
    # Target sources write pattern-A bigrams, the rest pattern B. A
    # doc in a NON-target source whose text is pattern A must score
    # above every pattern-B doc: DSIR ranks by target-likeness of
    # content, not by source label.
    a_text = "alpha beta gamma delta alpha beta gamma delta"
    b_text = "omega psi chi phi omega psi chi phi"
    rows = [
        (1, a_text, "en", "src1", 0),
        (2, a_text, "en", "src2", 0),
        (3, a_text, "en", "src3", 0),
        (4, a_text, "en", "src9", 0),  # target-LIKE, non-target source
        (5, b_text, "en", "src9", 0),
        (6, b_text, "en", "src8", 0),
    ]
    out = run(spark, "q433_dsir_importance", _docs_dir(tmp_path, rows)).collect()
    score = {r["doc_id"]: r["logratio_micro"] for r in out}
    assert score[4] > score[5]
    assert score[4] > score[6]
    assert score[4] == score[1]  # same content, same hashed features


def test_q434_one_pos_per_query_and_scores_dominate(spark):
    rows = run(spark, "q434_bm25_hard_negatives").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {1, 2, 3}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["label"] for r in rs][0] == "pos"
        assert all(lbl == "neg" for lbl in [r["label"] for r in rs][1:])
        scores = [r["score_e4"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_q435_epoch_cap_and_budget_accounting(spark):
    rows = run(spark, "q435_token_budget_epochs").collect()
    assert rows, "no sources"
    for r in rows:
        assert 0 <= r["epochs_milli"] <= 4000
        assert r["served_tokens"] + r["unfilled_tokens"] == r["target_alloc"]
        # served never exceeds what the cap allows
        assert r["served_tokens"] <= 4 * r["tokens"]


def test_q436_per_node_ranking_structure(spark):
    rows = run(spark, "q436_link_topk_per_node").collect()
    by_node = {}
    for r in rows:
        by_node.setdefault(r["node"], []).append(r)
    for node, rs in by_node.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        keys = [(-r["jacc_ppm"], r["cand"]) for r in rs]
        assert keys == sorted(keys), f"rank order broken at node {node}"


def test_q437_recall_monotone_and_exhaustive_at_full_probe(spark):
    rows = {r["nprobe"]: r for r in run(spark, "q437_ivf_recall_curve").collect()}
    assert set(rows) == {1, 2, 4, 8}
    rec = [rows[p]["recall_bp"] for p in (1, 2, 4, 8)]
    vol = [rows[p]["n_candidates"] for p in (1, 2, 4, 8)]
    assert rec == sorted(rec), f"recall not monotone in nprobe: {rec}"
    assert vol == sorted(vol), f"candidates not monotone in nprobe: {vol}"
    # probing every cell IS brute force: recall must be exactly 1
    assert rec[-1] == 10000


def test_q31b_structure_and_bounded_by_exact(spark):
    # In-bucket rerank can never beat the exact top-1 cosine, and each
    # query's ranking must be contiguous and sorted.
    exact = {
        r["query_id"]: r["cos_sim"]
        for r in run(spark, "q30_knn_cosine").collect()
        if r["rank"] == 1
    }
    rows = run(spark, "q31b_ann_lsh_det").collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        cs = [r["cos_e6"] for r in rs]
        assert cs == sorted(cs, reverse=True)
        # e6-quantized LSH top-1 <= e6-quantized exact top-1 (+1 ulp of
        # the two quantizations)
        assert cs[0] <= round(exact[qid] * 1e6 * 1.0001) + 100


def test_q438_share_accounting(spark, tmp_path):
    rows = run(spark, "q438_wimbd_ngram_census").collect()
    assert len(rows) == 20
    cums = [r["cum_share_bp"] for r in rows]
    assert cums == sorted(cums), "cumulative share must be nondecreasing"
    assert cums[-1] <= 10000
    for r in rows:
        assert r["n_docs"] <= r["occurrences"]
        assert r["share_bp"] <= r["cum_share_bp"]
    # constructed corpus: one 5-gram repeated across two docs dominates
    t = "aa bb cc dd ee"
    rows2 = run(
        spark,
        "q438_wimbd_ngram_census",
        _docs_dir(
            tmp_path,
            [
                (1, t + " " + t, "en", "s", 0),
                (2, t, "en", "s", 0),
                (3, "zz yy xx ww vv", "en", "s", 0),
            ],
        ),
    ).collect()
    top = rows2[0]
    assert top["gram"] == "aa bb cc dd ee"
    assert top["occurrences"] == 3  # doc1 has 2 (positions 1 and 6), doc2 has 1
    assert top["n_docs"] == 2


def test_q439_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q439_filter_ensemble_census")


def test_q439_single_gate_failures_land_at_k3(spark, tmp_path):
    # Construct one doc per single-gate failure plus one all-pass doc:
    # the census must put exactly three docs at k=3 and one at k=4.
    # (All-pass needs: >=10 tokens, mean len in [2,12], >=80% alpha,
    # >=2 distinct Gopher stopwords.)
    good = "the cat sat of the mat and dogs ran far"  # 10 toks, 3 stops
    short = "the of cat"  # fails min-length only
    nonalpha = "the of 11 22 33 44 55 66 77 88"  # fails alpha only
    nostop = "cat sat mat dog ran far big red car pig"  # fails stopword only
    rows = [
        (1, good, "en", "s", 0),
        (2, short, "en", "s", 0),
        (3, nonalpha, "en", "s", 0),
        (4, nostop, "en", "s", 0),
    ]
    out = {
        r["n_pass"]: r
        for r in run(
            spark, "q439_filter_ensemble_census", _docs_dir(tmp_path, rows)
        ).collect()
    }
    assert out[4]["n_docs"] == 1
    assert out[3]["n_docs"] == 3
    assert sum(r["n_docs"] for r in out.values()) == 4
    assert sum(r["docs_bp"] for r in out.values()) <= 10000


def test_q439_null_text_row_scores_zero(spark, tmp_path):
    # ADVICE r10 (medium): a NULL text makes every gate signal NULL;
    # raw boolean casts would park the doc in an n_pass=NULL group,
    # while the DuckDB oracle's CASE WHEN ... ELSE 0 scores it
    # n_pass=0. Both engines must agree: run the registered oracle SQL
    # on the same fixture and compare frames exactly.
    import duckdb

    good = "the cat sat of the mat and dogs ran far"
    df = pd.DataFrame(
        [(1, good, "en", "s", 0), (2, None, "en", "s", 0)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["n_chars"].astype("int64")
    d = tmp_path / "docs_null439"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "documents.parquet", index=False)

    out = {
        r["n_pass"]: (r["n_docs"], r["n_tokens"], r["docs_bp"])
        for r in run(spark, "q439_filter_ensemble_census", str(d)).collect()
    }
    assert 0 in out and out[0][0] == 1, f"NULL doc must score n_pass=0: {out}"
    assert None not in out, "no n_pass=NULL group may exist"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    # oracle column order: n_pass, n_docs, docs_bp, n_tokens, tokens_bp
    oracle = {
        int(r[0]): (int(r[1]), int(r[3] or 0), int(r[2] if r[2] is not None else 0))
        for r in con.execute(
            QUERIES["q439_filter_ensemble_census"].oracle
        ).fetchall()
    }
    spark_cmp = {
        k: (v[0], v[1] or 0, v[2] if v[2] is not None else 0)
        for k, v in out.items()
    }
    assert spark_cmp == oracle
