"""Property-based tests (hypothesis) for the parsing/text surface.

The reference has no property tests (SURVEY.md §5.1 — a stub suite);
these pin total-function behavior: no crash on arbitrary input, outputs
within declared ranges, invariants that must hold for ANY document.

Batched: hypothesis generates a corpus per property, evaluated in one
Spark job (per-example Spark jobs would be pathologically slow).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ooh_etl_spark.functions import html as H
from ooh_etl_spark.functions.text import quality_score, tokenize, word_shingles


def run_batch(spark, texts: list[str], col_fn):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [r.v for r in df.select(col_fn(F.col("t")).alias("v")).collect()]


printable = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"), max_size=200
)

# The codegen xpath path's domain: markup-ish text. Stray '<'/'>' that
# is not actual markup is the lenient fallback's territory (see
# wrap_fragment docstring); everything else — control chars, bare '&',
# unicode — must be total here.
markupish = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00<>"), max_size=200
)


@settings(max_examples=30, deadline=None)
@given(st.lists(markupish, min_size=1, max_size=30))
def test_pay_map_total_on_markupish_input(spark, texts):
    # Dirty-but-markup-ish CDATA must not crash; wages, when extracted,
    # are positive and 2-dp.
    for m in run_batch(spark, texts, H.pay_map):
        assert m is not None
        for v in m.values():
            assert v > 0
            assert round(v, 2) == v


@settings(max_examples=30, deadline=None)
@given(st.lists(printable, min_size=1, max_size=30))
def test_fallback_total_on_fully_arbitrary_input(spark, texts):
    from ooh_etl_spark.functions.html_fallback import tag_texts

    for v in run_batch(spark, texts, lambda c: tag_texts(c, "p")):
        assert v is not None


@settings(max_examples=30, deadline=None)
@given(st.lists(printable, min_size=1, max_size=30))
def test_extract_after_heading_null_or_nonempty(spark, texts):
    for v in run_batch(spark, texts, H.extract_after_heading):
        assert v is None or len(v) > 0  # group 3 is (.+): never ''


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="ab c", min_size=1, max_size=60), min_size=1, max_size=50))
def test_shingles_never_empty_and_distinct(spark, texts):
    for sh in run_batch(spark, texts, lambda c: word_shingles(c, 3)):
        assert len(sh) >= 1
        assert len(sh) == len(set(sh))


@settings(max_examples=30, deadline=None)
@given(st.lists(printable.filter(lambda s: s.strip()), min_size=1, max_size=50))
def test_quality_score_bounded(spark, texts):
    for q in run_batch(spark, texts, quality_score):
        assert q is None or -0.0001 <= q <= 1.0001


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet="abc xyz", min_size=1, max_size=60), min_size=1, max_size=40))
def test_tokenize_roundtrip_count(spark, texts):
    # len(tokens) == whitespace-separated word count of the trimmed text.
    got = run_batch(spark, texts, lambda c: F.size(tokenize(c)))
    expected = [len(t.strip().lower().split()) if t.strip() else 1 for t in texts]
    assert got == expected


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.sampled_from("abcdefghij"), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=20),
    st.integers(min_value=1, max_value=5),
)
def test_mg_merge_contains_all_heavy_hitters(tokens, k, n_batches):
    # The Misra-Gries candidate guarantee behind q120: every value with
    # count > n/k MUST survive the bounded-state merge, under any
    # batching of the input.
    import pandas as pd

    from ooh_etl_spark.operators.sketches import mg_merge

    chunks = [tokens[i::n_batches] for i in range(n_batches)]
    batches = (pd.Series(c).value_counts() for c in chunks if c)
    candidates = set(mg_merge(batches, k).index)
    n = len(tokens)
    true_hh = {v for v in set(tokens) if tokens.count(v) * k > n}
    assert true_hh <= candidates, (true_hh, candidates, k)
    assert len(candidates) <= 2 * k  # bounded state (k per compress round)


# (The former driver-side PyBloom and its no-false-negatives property
# test were removed with the Python prefilter: bloom_semi_join now
# delegates scan pruning to Spark's runtime filter injection, asserted
# plan-side in tests/test_plans.py::test_q121_bloom_join_is_jvm_only.)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00 \t\n\r"),
            min_size=0,
            max_size=8,
        ),
        min_size=0,
        max_size=40,
    )
)
def test_word_count_map_matches_python_counter(spark, words):
    # The flagship run-length construction must agree with a plain
    # Python Counter over the same whitespace split, for ANY token
    # multiset (duplicates, empty tokens, unicode) — the invariant that
    # has survived two rewrites (quadratic filter → sorted run-length).
    # The Python reference spells out Java's \s class ([ \t\n\x0B\f\r])
    # — Python's unicode \s also matches U+001C-001F and friends, which
    # Java's does not.
    import re
    from collections import Counter

    from ooh_etl_spark.queries.flagship import word_count_map

    text = " ".join(words)
    [m] = run_batch(spark, [text], word_count_map)
    assert m == dict(Counter(re.split(r"[ \t\n\x0b\f\r]+", text)))
