"""Invariant + independent-reference tests for the round-4 stats/eval
wave (q196-q205), beyond the oracle differential: the oracle proves
Spark == DuckDB; these prove both equal the MATH (the q192 Welch
precedent — an independent Python recomputation from the raw parquet)
and pin the structural invariants each statistic must satisfy.
"""

from __future__ import annotations

import pytest

# Oracle-replica / deep-functional suite: excluded from the default
# fast-core gate run (see pytest.ini); run with `-m slow`.
pytestmark = pytest.mark.slow

import duckdb
import pandas as pd

from ooh_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR


def run(spark, name: str) -> pd.DataFrame:
    return QUERIES[name].fn(spark, SF_DIR).toPandas()


def test_q196_auc_matches_independent_recomputation(spark):
    out = run(spark, "q196_roc_auc").iloc[0]
    raw = duckdb.sql(
        f"SELECT label, CAST(embedding[1] AS DOUBLE) AS s FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    ).df()
    y = (raw["label"] % 2).to_numpy()
    s = (raw["s"] * 1_000_000).round().astype("int64").to_numpy()
    # Mann-Whitney AUC by pairwise comparison (O(n^2) reference).
    pos = s[y == 1]
    neg = s[y == 0]
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    auc = wins / (len(pos) * len(neg))
    assert out["pos_n"] == len(pos) and out["neg_n"] == len(neg)
    assert abs(out["auc_e6"] - round(1_000_000 * auc)) <= 1
    assert 0 <= out["auc_e6"] <= 1_000_000


def test_q197_gini_bounded_and_matches_reference(spark):
    out = run(spark, "q197_gini_by_nation")
    assert ((out["gini_e6"] >= 0) & (out["gini_e6"] < 1_000_000)).all()
    # Independent recomputation for every nation from raw parquet.
    raw = duckdb.sql(
        f"""
        SELECT c_nationkey, c_custkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
        FROM read_parquet('{SF_DIR}/orders.parquet') o
        JOIN read_parquet('{SF_DIR}/customer.parquet') c
          ON o_custkey = c_custkey
        GROUP BY 1, 2
        """
    ).df()
    nations = duckdb.sql(
        f"SELECT n_nationkey, n_name FROM read_parquet('{SF_DIR}/nation.parquet')"
    ).df()
    name_of = dict(zip(nations.n_nationkey, nations.n_name))
    for nk, grp in raw.groupby("c_nationkey"):
        x = grp.sort_values(["rev", "c_custkey"]).rev.to_numpy()
        n = len(x)
        gini = (2.0 * sum((i + 1) * v for i, v in enumerate(x))) / (
            n * x.sum()
        ) - (n + 1.0) / n
        got = out.loc[out.nation == name_of[nk]].iloc[0]
        assert got["n_customers"] == n
        assert abs(got["gini_e6"] - round(1_000_000 * gini)) <= 1


def test_q198_changepoint_day_inside_series(spark):
    out = run(spark, "q198_cusum_changepoint")
    days = duckdb.sql(
        f"SELECT event_type, min(CAST(ts AS DATE)) AS lo, "
        f"max(CAST(ts AS DATE)) AS hi FROM "
        f"read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"
    ).df()
    m = out.merge(days, on="event_type")
    assert len(m) == len(out)
    assert ((m.change_day >= m.lo) & (m.change_day <= m.hi)).all()
    assert (m.cusum_e2 >= 0).all()


def test_q199_mase_positive_per_type(spark):
    out = run(spark, "q199_mase_seasonal")
    assert (out.mase_e6 > 0).all()
    assert (out.n_days >= 8).all()  # lag-7 needs at least 8 days


def test_q200_hhi_bounds(spark):
    out = run(spark, "q200_hhi_concentration")
    # 1/n <= HHI <= 1: equality on the left iff all shares equal.
    lo = (1_000_000 / out.n_suppliers).round() - 1
    assert (out.hhi_e6 >= lo).all()
    assert (out.hhi_e6 <= 1_000_000).all()


def test_q201_pairs_are_bigrams_and_top1_matches_python(spark):
    out = run(spark, "q201_bpe_merge_pairs")
    assert (out["pair"].str.len() == 2).all()
    assert (out.merge_count.sort_values(ascending=False).to_numpy()
            == out.merge_count.to_numpy()).all()
    # Independent top-pair recount in pure Python.
    texts = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()["text"]
    from collections import Counter

    wc: Counter = Counter()
    for t in texts:
        wc.update(w for w in t.lower().split() if w)
    pc: Counter = Counter()
    for w, f in wc.items():
        for i in range(len(w) - 1):
            pc[w[i : i + 2]] += f
    top_pair, top_n = max(pc.items(), key=lambda kv: (kv[1], kv[0]))
    assert out.iloc[0]["pair"] == top_pair or out.iloc[0]["merge_count"] == top_n
    assert out.iloc[0]["merge_count"] == top_n


def test_q202_negatives_never_self_and_in_range(spark):
    out = run(spark, "q202_negative_sampling")
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert len(out) == 2 * n_docs
    assert (out.neg_id != out.doc_id).all()
    assert ((out.neg_id >= 0) & (out.neg_id < n_docs)).all()
    assert set(out.neg_rank) == {1, 2}


def test_q203_each_epoch_is_a_permutation_and_orders_differ(spark):
    out = run(spark, "q203_epoch_shuffle")
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    for epoch, grp in out.groupby("epoch"):
        # every doc exactly once per epoch
        assert sorted(grp.doc_id) == list(range(n_docs))
        # contiguous 1..k positions within every shard
        for _, sh in grp.groupby("shard"):
            assert sorted(sh.pos) == list(range(1, len(sh) + 1))
    e0 = out[out.epoch == 0].sort_values(["shard", "pos"]).doc_id.tolist()
    e1 = out[out.epoch == 1].sort_values(["shard", "pos"]).doc_id.tolist()
    assert e0 != e1  # the epochs genuinely reshuffle


def test_q204_true_pairs_match_and_error_consistent(spark):
    out = run(spark, "q204_join_size_estimate").iloc[0]
    true_pairs = duckdb.sql(
        f"SELECT CAST(sum(c * c) AS BIGINT) FROM (SELECT count(*) AS c "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet') GROUP BY l_partkey)"
    ).fetchone()[0]
    assert out["true_pairs"] == true_pairs
    assert out["est_pairs"] % 8 == 0  # scaled by 1/p
    assert out["err_bp"] == round(
        10000.0 * (out["est_pairs"] - true_pairs) / true_pairs
    )


def test_q205_matches_independent_shapley_recursion(spark):
    out = run(spark, "q205_knn_shapley")
    raw = duckdb.sql(
        f"SELECT vec_id, label, embedding::DOUBLE[] AS e FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    vecs = {r.vec_id: list(r.e) for r in raw.itertuples()}
    labels = {r.vec_id: r.label for r in raw.itertuples()}

    def fold_dot(a, b):  # left fold, matching the engines exactly
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    K = 5
    for qid in range(5):
        qv, qy = vecs[qid], labels[qid]
        rows = []
        qq = fold_dot(qv, qv)
        for vid, cv in vecs.items():
            if vid == qid:
                continue
            d2 = qq + fold_dot(cv, cv) - 2 * fold_dot(qv, cv)
            rows.append((d2, vid, 1 if labels[vid] == qy else 0))
        rows.sort()  # (dist2, vec_id) ascending — the engines' order
        n = len(rows)
        tj = [
            round(
                1e9
                * (rows[i][2] - (rows[i + 1][2] if i + 1 < n else 0))
                / max(i + 1, K)
            )
            for i in range(n)
        ]
        suffix = 0
        phi = {}
        for i in range(n - 1, -1, -1):
            suffix += tj[i]
            phi[rows[i][1]] = suffix
        top = sorted(phi.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got = out[out.query_id == qid].sort_values("rank")
        assert list(got.vec_id) == [v for v, _ in top]
        assert list(got.phi_e9) == [p for _, p in top]


def test_q206_yield_curve_monotone_and_totals(spark):
    out = run(spark, "q206_quality_yield_curve")
    # buckets descend; cumulative columns are non-decreasing top-down
    assert (out.bucket.to_numpy()[:-1] > out.bucket.to_numpy()[1:]).all()
    assert (out.cum_docs.to_numpy()[:-1] <= out.cum_docs.to_numpy()[1:]).all()
    assert out.cum_docs.iloc[-1] == out.n_docs.sum()
    assert out.cum_tokens.iloc[-1] == out.n_tokens.sum()


def test_q207_decay_never_exceeds_raw_count_scale(spark):
    out = run(spark, "q207_decayed_trending")
    # each day's weight <= 1e6, so trend_e6 <= n_events * 1e6; and > 0
    assert (out.trend_e6 <= out.n_events * 1_000_000).all()
    assert (out.trend_e6 > 0).all()


def test_q208_weighted_median_matches_numpy_reference(spark):
    out = run(spark, "q208_weighted_median")
    raw = duckdb.sql(
        f"SELECT l_returnflag AS flag, "
        f"CAST(round(l_extendedprice * 100) AS BIGINT) AS p, "
        f"CAST(l_quantity AS BIGINT) AS w "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).df()
    for flag, grp in raw.groupby("flag"):
        g = grp.sort_values("p")
        cum = g.w.cumsum()
        tot = g.w.sum()
        wm = g.p[(2 * cum >= tot)].iloc[0] / 100.0
        got = out[out.flag == flag].iloc[0]
        assert got["weighted_median"] == round(wm, 2)
        assert got["total_qty"] == tot


def test_q209_gram_matches_numpy_reference(spark):
    import numpy as np

    out = run(spark, "q209_embedding_gram")
    raw = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).df()
    X = np.stack(raw["embedding"].to_numpy()).astype(np.float64)
    n, d = X.shape
    assert len(out) == d * (d + 1) // 2
    assert (out["n_vec"] == n).all()
    # Quantize per-row products exactly as the engines do, then sum.
    got = {(r.i, r.j): r.gram_nano for r in out.itertuples()}
    for i, j in [(0, 0), (0, 63), (7, 31), (63, 63)]:
        ref = int(np.floor(X[:, i] * X[:, j] * 1e9).sum())
        assert got[(i, j)] == ref
    # Diagonal entries are sums of squares: non-negative.
    diag = out[out.i == out.j]
    assert (diag["gram_nano"] >= 0).all()


def test_q210_kappa_matches_independent_recomputation(spark):
    out = run(spark, "q210_cohens_kappa")
    raw = duckdb.sql(
        f"""
        SELECT lang,
               CASE WHEN n_chars > 310 THEN 1 ELSE 0 END AS ra,
               CASE WHEN len(text) - len(replace(text, 'e', '')) > 28
                    THEN 1 ELSE 0 END AS rb
        FROM read_parquet('{SF_DIR}/documents.parquet')
        """
    ).df()
    import math

    for r in out.itertuples():
        g = raw[raw.lang == r.lang]
        n = len(g)
        po = ((g.ra == g.rb).sum()) / n
        pe = (
            (g.ra == 1).sum() * (g.rb == 1).sum()
            + (g.ra == 0).sum() * (g.rb == 0).sum()
        ) / (n * n)
        assert r.n == n and r.n_agree == (g.ra == g.rb).sum()
        if pe == 1.0:
            assert pd.isna(r.kappa_bp)
        else:
            kappa = (po - pe) / (1 - pe)
            assert r.kappa_bp == math.floor(10000 * kappa)
            assert -10000 <= r.kappa_bp <= 10000
    # The two raters must actually disagree somewhere, or the test
    # is vacuous (kappa trivially 1).
    assert (out["n_agree"] < out["n"]).any()


def test_q211_km_matches_independent_product_limit(spark):
    import math

    out = run(spark, "q211_kaplan_meier")
    raw = duckdb.sql(
        f"""
        WITH s AS (
          SELECT user_id, min(ts) AS signup_ts
          FROM read_parquet('{SF_DIR}/events.parquet')
          WHERE event_type = 'signup' GROUP BY user_id),
        m AS (SELECT max(ts) AS max_ts
              FROM read_parquet('{SF_DIR}/events.parquet')),
        p AS (
          SELECT s.user_id, min(e.ts) AS conv_ts
          FROM s JOIN read_parquet('{SF_DIR}/events.parquet') e
            ON e.user_id = s.user_id
           AND e.event_type = 'purchase' AND e.ts >= s.signup_ts
          GROUP BY s.user_id)
        SELECT CAST(FLOOR(date_diff('second', s.signup_ts,
                 coalesce(p.conv_ts, m.max_ts)) / 3600.0) AS BIGINT) AS t_h,
               CASE WHEN p.conv_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM s LEFT JOIN p USING (user_id), m
        """
    ).df()
    n_at_risk = len(raw)
    cum = 0
    rows = {r.t_h: r for r in out.itertuples()}
    for t_h, g in raw.sort_values("t_h").groupby("t_h", sort=True):
        d = int(g.ev.sum())
        c = int(len(g) - d)
        r = rows[t_h]
        assert (r.d, r.c, r.n_risk) == (d, c, n_at_risk)
        if d > 0:
            if d < n_at_risk:
                cum += round(1_000_000 * math.log((n_at_risk - d) / n_at_risk))
            else:
                cum += -99_000_000
        assert r.surv_log_micro == cum
        n_at_risk -= d + c
    # Survival is non-increasing and the risk set drains to zero.
    assert (out["surv_log_micro"].diff().dropna() <= 0).all()
    assert out["n_risk"].iloc[-1] == out["d"].iloc[-1] + out["c"].iloc[-1]


def test_q212_trigrams_match_pandas_reference(spark):
    out = run(spark, "q212_event_path_trigrams")
    raw = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM "
        f"read_parquet('{SF_DIR}/events.parquet') ORDER BY user_id, ts, event_id"
    ).df()
    from collections import Counter

    cnt, users = Counter(), {}
    for _, g in raw.groupby("user_id"):
        seq = list(g.event_type)
        for a, b, c in zip(seq, seq[1:], seq[2:]):
            p = f"{a}>{b}>{c}"
            cnt[p] += 1
            users.setdefault(p, set()).add(g.user_id.iloc[0])
    for r in out.itertuples():
        assert cnt[r.path] == r.n
        assert len(users[r.path]) == r.n_users
        assert r.n_users <= r.n
    # top-25 by count: the smallest shown count must be >= any hidden one
    shown = set(out.path)
    hidden_max = max((v for k, v in cnt.items() if k not in shown), default=0)
    assert out.n.min() >= hidden_max


def test_q213_mad_matches_numpy_and_bounds(spark):
    import numpy as np

    out = run(spark, "q213_mad_outliers")
    raw = duckdb.sql(
        f"SELECT event_type, CAST(round(value*1000000) AS BIGINT) v "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    for r in out.itertuples():
        v = np.sort(raw[raw.event_type == r.event_type].v.to_numpy())
        # discrete (type-1) median: smallest value with cume_dist >= .5
        med = v[int(np.ceil(len(v) * 0.5)) - 1]
        d = np.sort(np.abs(v - med))
        mad = d[int(np.ceil(len(d) * 0.5)) - 1]
        assert (r.med_u, r.mad_u, r.n) == (med, mad, len(v))
        assert r.n_outliers == int((6745 * np.abs(v - med) > 35000 * mad).sum())
        assert r.n_outliers < r.n / 2  # the robust scale can't flag a majority


def test_q214_check_digit_makes_luhn_valid(spark):
    out = run(spark, "q214_luhn_check_digits")
    import hashlib

    def luhn_ok(digits):  # full-number validation, rightmost doubled 2nd
        s = 0
        for pos, d in enumerate(reversed(digits), start=1):
            if pos % 2 == 0:
                d *= 2
                if d > 9:
                    d -= 9
            s += d
        return s % 10 == 0

    assert out.n_accounts.sum() == duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchone()[0]
    for r in out.itertuples():
        h = hashlib.md5(str(r.example_custkey).encode()).hexdigest()
        payload = [ord(c) % 10 for c in h[:15]]
        # appended check digit must validate, any other digit must not
        assert luhn_ok(payload + [r.check_digit])
        assert not any(
            luhn_ok(payload + [c]) for c in range(10) if c != r.check_digit
        )


def test_q215_merge_round_matches_python_bpe(spark):
    out = run(spark, "q215_bpe_merge_round")
    raw = duckdb.sql(
        f"SELECT lower(text) t FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    import re
    from collections import Counter

    words = Counter()
    for t in raw.t:
        for w in re.split(r"\s+", t):
            if w:
                words[w] += 1
    pairs = Counter()
    for w, f in words.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += f
    top = min(pairs, key=lambda p: (-pairs[p], p[0], p[1]))
    assert out.merged_pair.iloc[0] == top[0] + top[1]
    # greedy left-to-right merge, then recount
    newpairs, sym_after, sym_before = Counter(), 0, 0
    for w, f in words.items():
        syms, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and (w[i], w[i + 1]) == top:
                syms.append(w[i] + w[i + 1])
                i += 2
            else:
                syms.append(w[i])
                i += 1
        sym_before += f * len(w)
        sym_after += f * len(syms)
        for a, b in zip(syms, syms[1:]):
            newpairs[f"{a}>{b}"] += f
    assert out.symbols_before.iloc[0] == sym_before
    assert out.symbols_after.iloc[0] == sym_after
    assert sym_after < sym_before  # the merge must actually compress
    for r in out.itertuples():
        assert newpairs[r.pair] == r.merge_count


def test_q216_directions_match_pandas(spark):
    out = run(spark, "q216_simpsons_paradox")
    raw = duckdb.sql(
        f"""
        SELECT CAST(year(l_shipdate) AS BIGINT) yr,
               CAST(l_discount >= 0.05 AS INT) hi,
               CAST(l_returnflag = 'R' AS INT) ret
        FROM read_parquet('{SF_DIR}/lineitem.parquet')
        """
    ).df()
    import numpy as np

    tn_a = int(raw.hi.sum())
    tr_a = int((raw.hi * raw.ret).sum())
    tn_b = int((1 - raw.hi).sum())
    tr_b = int(((1 - raw.hi) * raw.ret).sum())
    dp = int(np.sign(tr_a * tn_b - tr_b * tn_a))
    assert (out.dir_pooled == dp).all()
    for r in out.itertuples():
        g = raw[raw.yr == r.yr]
        na, ra = int(g.hi.sum()), int((g.hi * g.ret).sum())
        nb, rb = int((1 - g.hi).sum()), int(((1 - g.hi) * g.ret).sum())
        assert (r.n_a, r.r_a, r.n_b, r.r_b) == (na, ra, nb, rb)
        assert r.dir_stratum == int(np.sign(ra * nb - rb * na))
        assert r.flipped == int(na > 0 and nb > 0 and r.dir_stratum * dp == -1)


def test_q221_hll_estimate_accuracy_and_merge(spark):
    """The from-primitives HLL must land within the ~3*1.04/sqrt(256)
    relative-error envelope of the exact distinct counts, and the
    merged 'ALL' sketch must estimate the union, not the sum."""
    out = run(spark, "q221_hll_registers").set_index("event_type")
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, count(DISTINCT event_id) FROM "
            f"read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    exact["ALL"] = duckdb.sql(
        f"SELECT count(DISTINCT event_id) FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    rel = 3 * 1.04 / (256 ** 0.5)  # 3 sigma for m=256
    for et, n in exact.items():
        est = out.loc[et, "hll_estimate"]
        assert abs(est - n) <= max(rel * n, 10), (et, est, n)
    # merged estimate ~ union cardinality, far below the per-type sum
    per_type_sum = sum(v for k, v in exact.items() if k != "ALL")
    assert out.loc["ALL", "hll_estimate"] < 1.2 * exact["ALL"]
    assert per_type_sum >= exact["ALL"]  # sanity on the fixture


def test_q222_markov_attribution_invariants(spark):
    """Removal-effect sanity: base variant has zero effect by
    definition; every channel's removal can only reduce conversion
    (effect in [0, 10000] bp); probabilities stay inside the ppb
    simplex; and removing a channel that appears on converting paths
    must strictly hurt (all four synthetic channels do)."""
    out = run(spark, "q222_markov_attribution")
    assert list(out.variant) == sorted(out.variant)
    base = out[out.variant == "base"]
    assert len(base) == 1 and base.removal_effect_bp.iloc[0] == 0
    assert (out.conv_ppb >= 0).all() and (out.conv_ppb <= 1_000_000_000).all()
    rm = out[out.variant != "base"]
    assert (rm.removal_effect_bp > 0).all()
    assert (rm.removal_effect_bp <= 10_000).all()
    assert (rm.conv_ppb < base.conv_ppb.iloc[0]).all()


def test_q225_dp_mechanism_properties(spark):
    """Laplace-mechanism invariants on the seeded draw: released
    counts are non-negative (post-processing), noise is two-sided and
    centered-ish (both signs occur; |noise| within ~b*ln(grid) hard
    bound), and the release differs from the true counts somewhere
    (the mechanism actually fires)."""
    import math

    out = run(spark, "q225_dp_noisy_counts")
    true = duckdb.sql(
        f"SELECT lang, source, count(*) n FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') GROUP BY 1,2"
    ).df().set_index(["lang", "source"])
    assert (out.noisy_n >= 0).all()
    assert (out.noise > 0).any() and (out.noise < 0).any()
    b = 2.0  # 1/eps
    hard = b * math.log(2 ** 20) + 1
    assert out.noise.abs().max() <= hard
    merged = out.set_index(["lang", "source"]).join(true)
    assert (
        merged.noisy_n == (merged.n + merged.noise).clip(lower=0)
    ).all()
    assert (out.noise != 0).any()


def test_q226_msprt_monotone_inputs_and_threshold(spark):
    """mSPRT invariants: cumulative sample sizes are non-decreasing
    day over day; the rejection flag is exactly the ln(1/alpha)
    threshold applied to the emitted statistic; and log-lambda's
    penalty term keeps it below zero when means are equal-ish early."""
    import math

    out = run(spark, "q226_msprt_sequential")
    assert list(out.day) == sorted(out.day)
    assert (out.n_a.diff().dropna() >= 0).all()
    assert (out.n_b.diff().dropna() >= 0).all()
    thr = 1_000_000 * math.log(1 / 0.05)
    assert (
        (out.log_lambda_micro >= thr) == (out.rejected == 1)
    ).all()


def test_q227_qte_matches_numpy_deciles(spark):
    import numpy as np

    out = run(spark, "q227_quantile_treatment_effect")
    raw = duckdb.sql(
        f"""
        SELECT user_id % 2 AS arm,
               sum(CAST(round(value * 100) AS BIGINT)) AS m
        FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY user_id
        """
    ).df()
    for arm, colname in ((0, "control_c"), (1, "treat_c")):
        v = np.sort(raw[raw.arm == arm].m.to_numpy())
        for r in out.itertuples():
            # type-1 discrete percentile: smallest v with cume_dist >= q
            want = v[int(np.ceil(len(v) * r.pct / 10)) - 1]
            assert getattr(r, colname) == want
    assert (out.qte_c == out.treat_c - out.control_c).all()


def test_q209_numpy_and_expression_forms_identical(spark):
    """The registered numpy partial-Gram and the pure-codegen
    expression form must produce BIT-IDENTICAL triangles — the
    insurance that lets the fast path swap in without changing
    semantics (both also pass the same DuckDB oracle)."""
    from ooh_etl_spark.queries.ml_ops import _gram_expression

    a = run(spark, "q209_embedding_gram")
    b = _gram_expression(spark, SF_DIR).toPandas()
    assert a.equals(b)


def test_q246_bloom_guarantees(spark):
    """Bloom structural guarantees on the from-primitives filter: ZERO
    false negatives (every inserted key must hit all its bits), FP
    only among absent keys, and the measured FPR within a loose
    multiple of the (1-e^{-kn/m})^k theory (small-sample Poisson
    slack)."""
    out = run(spark, "q246_bloom_from_primitives").iloc[0]
    assert out["n_false_neg"] == 0
    assert 0 <= out["n_false_pos"] <= out["n_probes"] - out["n_inserted"]
    # theory is in bp; allow [0, 5x theory + 300bp] measured
    assert out["fpr_bp"] <= 5 * out["theory_bp"] + 300


def test_q280_mann_whitney_matches_scipy_free_reference(spark):
    """U and the tie-corrected z recomputed independently in pure
    Python (midrank formulation) from the raw parquet must match the
    engine's histogram-trick values exactly (U) / to 1 micro (z)."""
    import math

    out = run(spark, "q280_mann_whitney").iloc[0]
    raw = duckdb.sql(
        f"SELECT user_id % 2 AS arm, CAST(round(value*1000000) AS BIGINT) v "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    a = sorted(raw[raw.arm == 0].v)
    b = sorted(raw[raw.arm == 1].v)
    from collections import Counter

    ca, call = Counter(a), Counter(list(raw.v))
    # U for arm1: for each b value, #a strictly below + half the ties
    below, u2 = {}, 0
    run_total = 0
    for v in sorted(call):
        below[v] = run_total
        run_total += ca.get(v, 0)
    for v in b:
        u2 += 2 * below[v] + ca.get(v, 0)
    na, nb, n = len(a), len(b), len(a) + len(b)
    tie3 = sum(t**3 - t for t in call.values())
    var = na * nb / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u2 / 2 - na * nb / 2) / math.sqrt(var)
    # engines round half away from zero; Python's round() banker's-rounds
    assert out["u_stat"] == math.floor(u2 / 2 + 0.5)
    assert abs(out["z_micro"] - round(1_000_000 * z)) <= 1


def test_q281_spearman_matches_pandas_reference(spark):
    out = run(spark, "q281_spearman").iloc[0]
    raw = duckdb.sql(
        f"SELECT CAST(n_chars AS BIGINT) x, "
        f"CAST(len(text) - len(replace(text,'e','')) AS BIGINT) y "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    ref = raw["x"].rank().corr(raw["y"].rank())  # pandas average-rank pearson
    assert abs(out["spearman_e6"] - round(1_000_000 * ref)) <= 2
    assert 0 < out["spearman_e6"] <= 1_000_000  # genuinely correlated pair
