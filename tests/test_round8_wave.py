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
