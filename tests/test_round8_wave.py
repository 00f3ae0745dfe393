"""Round-8 wave: Heaps'-law fit (q420), charset/byte-cost census
(q421), bigram document-frequency novelty profile (q422).

Each query gets (a) an oracle-differential check at sf0.001 via the
driver's exact compare path, and (b) a semantic property test on a
constructed corpus exercising the published guarantee through the
PRODUCTION query (a temp-dir documents.parquet, not a
re-implementation).
"""

from __future__ import annotations

import pandas as pd
import pytest
# Oracle-replica / deep-functional suite: excluded from the default
# fast-core gate run (see pytest.ini); run with `-m slow`.
pytestmark = pytest.mark.slow


from ooh_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle


def run(spark, name, sf_dir=SF_DIR):
    return QUERIES[name].fn(spark, sf_dir)


@pytest.mark.parametrize(
    "name",
    [
        "q420_heaps_law_fit",
        "q421_charset_cost_census",
        "q422_bigram_novelty_profile",
    ],
)
def test_round8_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def _docs_dir(tmp_path, rows):
    """Write a minimal documents.parquet a query can load as sf_dir."""
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    df["doc_id"] = df["doc_id"].astype("int64")
    (tmp_path / "d").mkdir(exist_ok=True)
    df.to_parquet(tmp_path / "d" / "documents.parquet", index=False)
    return str(tmp_path / "d")


def test_q420_heaps_beta_bounds(spark, tmp_path):
    # All-distinct-token docs have v = n exactly, so ln(v) = ln(n) and
    # the fitted exponent is exactly 1 (10000 bp). Single-repeated-token
    # docs have v = 1 for every n, so the slope is exactly 0.
    distinct_rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(5 + 3 * i)), "en", "s", 0)
        for i in range(6)
    ]
    repeat_rows = [
        (i, " ".join(["dup"] * (5 + 3 * i)), "de", "s", 0) for i in range(6)
    ]
    out = {
        r["lang"]: r
        for r in run(
            spark, "q420_heaps_law_fit", _docs_dir(tmp_path, distinct_rows + repeat_rows)
        ).collect()
    }
    assert out["en"].heaps_beta_bp == 10000
    assert out["de"].heaps_beta_bp == 0
    assert out["de"].sum_types == 6  # v = 1 per doc


def test_q421_byte_cost_exact(spark, tmp_path):
    # 'abcd' = 4 chars / 4 bytes; CJK is 3 bytes per char in UTF-8;
    # U+FFFD trips the replacement-doc counter.
    rows = [
        (1, "abcd", "en", "s", 0),
        (2, "日本語本", "zh", "s", 0),  # 4 chars, 12 bytes
        (3, "ab�cd", "fr", "s", 0),
    ]
    out = {
        r["lang"]: r
        for r in run(spark, "q421_charset_cost_census", _docs_dir(tmp_path, rows))
        .collect()
    }
    assert out["en"].bytes_per_char_e6 == 1_000_000
    assert out["en"].nonascii_bp == 0
    assert out["zh"].bytes_per_char_e6 == 3_000_000
    assert out["zh"].nonascii_bp == 10000
    assert out["fr"].n_replacement_docs == 1
    assert out["en"].n_replacement_docs == 0


def test_q422_novelty_extremes(spark, tmp_path):
    # Two identical docs: every distinct bigram has df = 2, so nothing
    # is novel (novelty_bp = 0). A doc with a fully private alphabet
    # has df = 1 everywhere (novelty_bp = 10000). A stock phrase
    # repeated across >= 5 docs crosses the n_common threshold.
    stock = "call now limited offer"
    rows = (
        [(1, "alpha beta gamma delta", "en", "twin", 0),
         (2, "alpha beta gamma delta", "en", "twin", 0),
         (3, "unique tokens only here", "en", "solo", 0)]
        + [(10 + i, f"pad{i}a pad{i}b " + stock, "en", "stock", 0)
           for i in range(5)]
    )
    out = {
        r["source"]: r
        for r in run(
            spark, "q422_bigram_novelty_profile", _docs_dir(tmp_path, rows)
        ).collect()
    }
    assert out["twin"].novelty_bp == 0
    assert out["twin"].n_unique == 0
    assert out["solo"].novelty_bp == 10000
    # the 5-doc stock phrase produces df>=5 bigrams in every stock doc
    assert out["stock"].n_common >= 5 * (len(stock.split()) - 1)


def test_q79_alpha_rule_on_mixed_tokens(spark, tmp_path):
    # Pin the regexp_extract_all n_alpha rewrite (r8: HOF lambdas are
    # interpreted; the string-expr form stays in codegen) to the
    # original filter(rlike('^[a-z]+$')) semantics on tokens the
    # synthetic corpus never produces: digits, embedded punctuation,
    # mixed alphanumerics, non-ASCII letters, multi-space runs.
    # 'one two2 thr-ee café  four x9 y' -> alpha tokens: one, four, y
    # (7 tokens, 3 alpha -> 5*3 < 4*7 fails the 80% rule).
    rows = [
        (1, "one two2 thr-ee café  four x9 y", "mixed", "en", 0),
        (2, "all pure alpha tokens here yes sir indeed ok fine good pal",
         "clean", "en", 0),
    ]
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "source", "lang", "n_chars"]
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    df["doc_id"] = df["doc_id"].astype("int64")
    (tmp_path / "d").mkdir(exist_ok=True)
    df.to_parquet(tmp_path / "d" / "documents.parquet", index=False)
    out = {
        r["source"]: r
        for r in run(spark, "q79_quality_rules", str(tmp_path / "d")).collect()
    }
    assert out["mixed"].n_fail_alpha == 1      # 3/7 alpha < 80%
    assert out["mixed"].n_fail_short == 1      # 7 < 10 tokens
    assert out["clean"].n_fail_alpha == 0      # 12/12 alpha
    assert out["clean"].n_keep == 1


# --- round-8 wave 2: split leakage audit (q423), C4 line dedup (q424) -------

_KNUTH_A = 2654435761
_KNUTH_M = 4294967296
_KNUTH_T = 3435973837


def _is_train(doc_id: int) -> bool:
    return (doc_id * _KNUTH_A) % _KNUTH_M < _KNUTH_T


@pytest.mark.parametrize(
    "name", ["q423_split_leakage_audit", "q424_line_dedup"]
)
def test_round8_wave2_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_q423_policy_ladder(spark, tmp_path):
    # Construct exactly two near-dup pairs, both straddling the Knuth
    # 80/20 split: one EXACT pair (identical text) and one NEAR pair
    # (one token differs). The policy ladder is then fully determined:
    # naive leaks both; exact-cluster de-leaks only the exact pair;
    # near-dup-component clustering leaks nothing (its structural
    # guarantee — every pair is intra-component).
    train_ids = [i for i in range(1, 40) if _is_train(i)]
    test_ids = [i for i in range(1, 40) if not _is_train(i)]
    xa, xb = train_ids[0], test_ids[0]  # exact pair, split-straddling
    na, nb = train_ids[1], test_ids[1]  # near pair, split-straddling
    x_text = " ".join(f"alpha{j}" for j in range(12))
    n_base = [f"beta{j}" for j in range(12)]
    n_text_a = " ".join(n_base)
    n_text_b = " ".join(n_base[:-1] + ["betaX"])  # 1 token differs
    rows = [
        (xa, x_text, "en", "s", 0),
        (xb, x_text, "en", "s", 0),
        (na, n_text_a, "en", "s", 0),
        (nb, n_text_b, "en", "s", 0),
    ]
    out = {
        r["policy"]: r
        for r in run(
            spark, "q423_split_leakage_audit", _docs_dir(tmp_path, rows)
        ).collect()
    }
    assert out["a_naive_hash"].n_pairs == 2
    assert out["a_naive_hash"].leaked_pairs == 2
    assert out["b_exact_cluster"].leaked_pairs == 1  # near pair still leaks
    assert out["c_neardup_cluster"].leaked_pairs == 0
    assert out["c_neardup_cluster"].leak_bp == 0


def test_q423_pair_free_corpus_matches_oracle(spark, tmp_path):
    # ADVICE r8: on a corpus with ZERO near-dup pairs the oracle still
    # emits its three policy rows; the Spark side must too (zero
    # counts, NULL leak_bp) — guarded by the literal policy frame
    # left-join. Verified against the actual DuckDB oracle on the same
    # pair-free corpus, through the driver's canonicalization.
    import duckdb

    from tools.check_oracle import canon_frame

    from ooh_etl_spark.queries import QUERIES

    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(12)), "en", "s", 0)
        for i in range(1, 6)
    ]
    d = _docs_dir(tmp_path, rows)
    sdf = run(spark, "q423_split_leakage_audit", d)
    srows = sdf.collect()
    assert len(srows) == 3
    for r in srows:
        assert r.n_pairs == 0 and r.leaked_pairs == 0 and r.leak_bp is None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    ores = con.execute(QUERIES["q423_split_leakage_audit"].oracle)
    ocols = [x[0] for x in ores.description]
    orows = ores.fetchall()
    scols = sorted(sdf.columns)
    assert canon_frame(srows, sdf.columns, scols) == canon_frame(
        orows, ocols, scols
    )


def test_q423_component_policy_never_leaks(spark, tmp_path):
    # Transitive chains: a~b and b~c near-dup but a,c share a component
    # only through b. The component policy must keep the WHOLE chain on
    # one side even when the min-id label travels multiple hops.
    base = [f"tok{j}" for j in range(12)]
    chain = [
        " ".join(base),
        " ".join(base[:-1] + ["varA"]),
        " ".join(base[:-2] + ["varA", "varB"]),
        " ".join(base[:-3] + ["varA", "varB", "varC"]),
    ]
    rows = [(i + 1, t, "en", "s", 0) for i, t in enumerate(chain)]
    out = {
        r["policy"]: r
        for r in run(
            spark, "q423_split_leakage_audit", _docs_dir(tmp_path, rows)
        ).collect()
    }
    assert out["c_neardup_cluster"].n_pairs >= 3  # chain adjacencies found
    assert out["c_neardup_cluster"].leaked_pairs == 0


def test_q424_first_occurrence_census(spark, tmp_path):
    # doc 1: one 8-token line L. doc 2: L again (removed — doc 1 wins
    # by doc_id order) + a private 8-token line (kept). doc 3: a
    # 3-token partial line (kept). Census is per source.
    line = " ".join(f"w{j}" for j in range(8))
    private = " ".join(f"p{j}" for j in range(8))
    rows = [
        (1, line, "en", "first", 0),
        (2, line + " " + private, "en", "second", 0),
        (3, "tiny partial line", "en", "third", 0),
    ]
    out = {
        r["source"]: r
        for r in run(spark, "q424_line_dedup", _docs_dir(tmp_path, rows)).collect()
    }
    assert out["first"].n_lines == 1 and out["first"].n_kept == 1
    assert out["second"].n_lines == 2 and out["second"].n_kept == 1
    assert out["second"].retained_lines_bp == 5000
    assert out["third"].n_lines == 1 and out["third"].n_kept == 1
    # char retention: doc 2 keeps only the private line's chars
    assert out["second"].n_chars_kept == len(private)
    assert out["second"].n_chars == len(line) + len(private)


def test_q424_retention_bounded_and_total(spark, tmp_path):
    # Every distinct line survives exactly once corpus-wide: sum of
    # kept over sources == number of distinct lines.
    line_a = " ".join(f"a{j}" for j in range(8))
    line_b = " ".join(f"b{j}" for j in range(8))
    rows = [
        (1, line_a + " " + line_b, "en", "s1", 0),
        (2, line_b + " " + line_a, "en", "s2", 0),
        (3, line_a, "en", "s3", 0),
    ]
    res = run(spark, "q424_line_dedup", _docs_dir(tmp_path, rows)).collect()
    assert sum(r["n_kept"] for r in res) == 2  # line_a, line_b
    assert sum(r["n_lines"] for r in res) == 5
