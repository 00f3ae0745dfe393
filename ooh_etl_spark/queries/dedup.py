"""Deduplication queries (BASELINE.json:6): exact, n-gram Jaccard,
MinHash LSH, SimHash. Exact + Jaccard are oracle-checked; the
probabilistic ones (spark.ml hashing, xxhash64 signatures) have no
DuckDB equivalent and use rows-only checks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ooh_etl_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from ooh_etl_spark.queries.registry import register
from ooh_etl_spark.tables import load_table

_DUCK_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"


@register(
    "q26_exact_dedup",
    """
    WITH kept AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
    SELECT source, count(*) AS n_kept
    FROM documents JOIN kept USING (doc_id)
    GROUP BY source
    """,
)
def q26_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy keeping the min doc_id —
    deterministic survivor choice (dropDuplicates is
    first-encountered, which is partitioning-dependent)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        exact_dedup(docs, key="text", id_col="doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


_DUCK_JACCARD = f"""
    WITH d AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
         s AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                                    i -> array_to_string(toks[i:i+2], ' ')))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM d),
         sz AS (SELECT doc_id, len(sh) AS sz FROM s),
         inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(shared / (sa.sz + sb.sz - shared), 4) AS jaccard
    FROM shared JOIN sz sa ON id_a = sa.doc_id
                JOIN sz sb ON id_b = sb.doc_id
    WHERE round(shared / (sa.sz + sb.sz - shared), 4) >= 0.5
"""


@register("q27_jaccard_pairs", _DUCK_JACCARD)
def q27_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs Jaccard over 3-shingles via the inverted index:
    shingle → posting list → grouped pair explode (never a self-join of
    the full table), sizes re-attached by join (AQE picks the
    strategy); threshold filter before output."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)


@register("q73_jaccard_prefix_filter", _DUCK_JACCARD)
def q73_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact result as q27 via prefix filtering (Bayardo WWW'07):
    only each doc's rarest `(1-t)*s + 1` shingles generate candidates,
    so frequent stop-shingles never enter pair expansion. On this
    fixture corpus (16-word docs, small vocabulary → dense overlap) the
    inverted-index form wins locally; prefix filtering is the scale
    path when documents are long and the shingle universe is sparse —
    candidate volume tracks the RARE-shingle posting lists instead of
    all of them. Both are registered against the same oracle so the
    equivalence is machine-checked every round."""
    from ooh_etl_spark.operators.dedup import jaccard_pairs_prefix

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs_prefix(docs, "text", "doc_id", n=3, threshold=0.5)


_DUCK_CLUSTERS = f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
         s AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                                    i -> array_to_string(toks[i:i+2], ' ')))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM d),
         sz AS (SELECT doc_id, len(sh) AS sz FROM s),
         inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
         pairs AS (
      SELECT id_a, id_b
      FROM shared JOIN sz sa ON id_a = sa.doc_id
                  JOIN sz sb ON id_b = sb.doc_id
      WHERE round(shared / (sa.sz + sb.sz - shared), 4) >= 0.5),
         edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs),
         reach(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id)
    SELECT id, min(label) AS cluster FROM reach GROUP BY id
"""


@register("q49_dup_clusters", _DUCK_CLUSTERS)
def q49_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → clusters via iterative min-label propagation
    (connected components; oracle = recursive CTE transitive closure)."""
    from ooh_etl_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    return connected_components(pairs)


@register("q28_minhash_pairs", None)  # spark.ml hashing → rows-only
def q28_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: per-doc signatures (xxhash64 per
    permutation), banded; pairs emitted per band bucket. Rows-only:
    probabilistic signatures have no SQL oracle; accuracy is asserted
    against exact Jaccard in tests."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "text", "doc_id", jaccard_distance=0.5)


@register("q29_simhash_pairs", None)  # xxhash64 signatures → rows-only
def q29_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: 64-bit weighted-token fingerprints,
    Hamming-banded; candidate pairs within distance threshold.
    Rows-only + property tests (bit flips bounded)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, "text", "doc_id", max_hamming=8)
