"""Round-10 additions: the q191b degree-capped link-prediction scale
cure (VERDICT r9 item 3) and its funnel-discipline equality pins."""
from __future__ import annotations

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

from tests.conftest import SF_DIR, assert_matches_oracle  # noqa: E402

from ooh_etl_spark.queries import QUERIES  # noqa: E402


def run(spark, name, sf_dir=SF_DIR):
    return QUERIES[name].fn(spark, sf_dir)


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
