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
