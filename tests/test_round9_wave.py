"""Round-9 additions: the q423b funnel-input leakage audit and the
round-9 query wave."""
from __future__ import annotations

import sys

import pandas as pd
import pytest

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
