"""Deduplication queries (BASELINE.json:6): exact, n-gram Jaccard,
MinHash LSH, SimHash. Exact + Jaccard are oracle-checked; the
probabilistic ones (spark.ml hashing, xxhash64 signatures) have no
DuckDB equivalent and use rows-only checks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ooh_etl_spark.operators.dedup import (
    _shingle_sets,
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


#: q27b oracle: the q27 SQL on the exact-deduped corpus view —
#: textually derived like q423b's, so the two can never drift.
_DUCK_JACCARD_FUNNEL = _DUCK_JACCARD.replace(
    "FROM documents",
    "FROM (SELECT * FROM documents WHERE doc_id IN "
    "(SELECT min(doc_id) FROM documents GROUP BY text))",
)
assert _DUCK_JACCARD_FUNNEL != _DUCK_JACCARD


@register("q27b_jaccard_pairs_funnel", _DUCK_JACCARD_FUNNEL)
def q27b_jaccard_pairs_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q27 behind the q162 funnel ordering (VERDICT r8 item 4 names
    q27 alongside q423): exact dedup FIRST (q26's min-id rule), then
    the near-dup pair scan on the collapsed corpus — the canonical
    at-scale entry for the pair pipeline. On replicated input the raw
    form's candidate volume grows with the SQUARE of per-key
    replication (SCALE.md r9: 90.8s at raw 10x vs 1.35s behind the
    funnel on the SAME corpus, 67x); on duplicate-free input the
    funnel stage is a no-op-sized window and the pair set is q27's
    minus exact-duplicate pairs (which exact dedup owns)."""
    docs = exact_dedup(
        load_table(spark, sf_dir, "documents"), key="text", id_col="doc_id"
    )
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


_SEM_K = 8  # clusters; production sizing is ~sqrt(n) (docstring)
_SEM_T = 0.4  # cosine threshold (matches the q50 fixture geometry)

_DUCK_SEMDEDUP = f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_SEM_K}),
         d AS (
      SELECT v.vec_id, c.cid,
             list_aggregate(list_transform(generate_series(1, len(e)),
                            i -> (e[i] - ce[i]) * (e[i] - ce[i])), 'sum') AS dist
      FROM v CROSS JOIN c),
         a AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
      FROM d),
         av AS (
      SELECT v.vec_id, v.e, a.cid AS cluster
      FROM v JOIN a ON v.vec_id = a.vec_id AND a.rk = 1),
         p AS (
      SELECT x.cluster, x.vec_id AS id_a, y.vec_id AS id_b
      FROM av x JOIN av y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      WHERE round(list_dot_product(x.e, y.e)
            / (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))),
            4) >= {_SEM_T})
    SELECT cluster, id_b AS dropped_id, min(id_a) AS kept_id, count(*) AS n_links
    FROM p GROUP BY cluster, id_b
    ORDER BY dropped_id
"""


def _semdedup(
    spark: SparkSession, sf_dir: str, k: int, dedup_first: bool = False
) -> DataFrame:
    """Shared SemDeDup pipeline, parameterized on the centroid count K.

    Clustering: nearest of the first-K vectors (deterministic, q102's
    rule; argmin via min(struct(dist, cid)), which ties to the
    smallest centroid id exactly like the oracle's row_number ORDER BY
    dist, cid). Dedup: within each
    cluster, a vector is dropped in favor of its smallest-id neighbor
    with cosine >= threshold (the q26 min-id survivor rule). The
    cluster id is the only pairwise shuffle key, so candidate volume is
    per-cluster-quadratic, never corpus-quadratic."""
    from ooh_etl_spark.operators.similarity import dot
    from ooh_etl_spark.tables import parallelize_rows

    emb = parallelize_rows(load_table(spark, sf_dir, "embeddings"))
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    if dedup_first:
        # Exact VECTOR dedup (q26's min-id rule keyed on the vector
        # VALUE): byte-identical embeddings collapse to one carrier
        # before clustering ever runs, so duplicate concentration
        # cannot inflate any cluster (SCALE.md r9: 199.6s -> ~1x cost
        # on 10x replicated embeddings). Grouping is by the array
        # value itself — at production scale key on xxhash64(digest)
        # instead to keep the shuffle narrow; the survivor rule is
        # identical.
        v = v.groupBy("e").agg(F.min("vec_id").alias("vec_id")).select(
            "vec_id", "e"
        )
    c = v.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    # Assignment is MAP-ONLY: the K centroids collapse into ONE row
    # (collect_list of (cid, ce) structs — K ≈ sqrt(n) rows, the same
    # broadcastability envelope as the previous per-row broadcast),
    # and each vector computes its argmin INSIDE a higher-order fold —
    # no crossJoin row expansion, no groupBy, and in particular no
    # SortAggregate (the previous min(struct)+first(array) form forced
    # sort-based aggregation because an array rode the agg buffer;
    # that chain also evaluated twice under the self-join, dominating
    # the query). The fold's tie-break (strictly-smaller dist, or
    # equal dist AND smaller cid) makes the argmin independent of
    # collect_list's arrival order, preserving the oracle's
    # row_number ORDER BY dist, cid semantics exactly.
    cagg = c.agg(F.collect_list(F.struct("cid", "ce")).alias("cents"))
    sq = lambda cent: F.aggregate(
        F.zip_with(F.col("e"), cent["ce"], lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    # Distances materialize once per centroid (transform), then the
    # argmin folds over scored structs — the sq() fold would otherwise
    # re-evaluate per comparison branch (no CSE inside lambdas).
    argmin = F.aggregate(
        F.transform(
            "cents",
            lambda cent: F.struct(
                sq(cent).alias("dist"), cent["cid"].alias("cid")
            ),
        ),
        F.struct(
            F.lit(float("inf")).alias("dist"),
            F.lit(2**62).cast("long").alias("cid"),
        ),
        lambda acc, x: F.when(
            (x["dist"] < acc["dist"])
            | ((x["dist"] == acc["dist"]) & (x["cid"] < acc["cid"])),
            x,
        ).otherwise(acc),
    )
    assign = v.crossJoin(F.broadcast(cagg)).select(
        "vec_id", "e", argmin["cid"].alias("cluster")
    )
    # Each vector's norm is computed ONCE here (the same sqrt(dot(v,v))
    # expression the oracle evaluates), not re-derived per pair — the
    # pairwise pass then costs one dot product per pair instead of
    # three, with bit-identical arithmetic (dot / (nrm_a * nrm_b)).
    # checkpoint the assigned corpus: BOTH sides of the within-cluster
    # self-join consume it, and without the checkpoint the K-centroid
    # argmin fold (the expensive stage) executed twice (audited: 4
    # parquet scans of embeddings in one plan; now 1).
    av = assign.select(
        "vec_id",
        "e",
        F.sqrt(dot(F.col("e"), F.col("e"))).alias("nrm"),
        "cluster",
    ).localCheckpoint()
    x = av.select(
        "cluster",
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("nrm_a"),
    )
    y = av.select(
        F.col("cluster").alias("cluster_b"),
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = (
        x.join(
            y,
            (F.col("cluster") == F.col("cluster_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("ea"), F.col("eb")) / (F.col("nrm_a") * F.col("nrm_b")), 4
            ),
        )
        .filter(F.col("cos_sim") >= _SEM_T)
    )
    return (
        pairs.groupBy("cluster", "id_b")
        .agg(F.min("id_a").alias("kept_id"), F.count(F.lit(1)).alias("n_links"))
        .select(
            "cluster",
            F.col("id_b").alias("dropped_id"),
            "kept_id",
            "n_links",
        )
        .orderBy("dropped_id")
    )


@register("q151_semdedup", _DUCK_SEMDEDUP)
def q151_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings, then finding near-duplicate
    pairs ONLY within each cluster — the clustering bounds the
    candidate set so the pairwise pass is per-cluster-quadratic, never
    corpus-quadratic. Exact oracle: every step (squared distance,
    ordered-fold dot product, 4-dp rounded cosine) is engine-identical,
    proven by q102/q50.

    K is pinned to 8 here because the DuckDB oracle must name a fixed
    centroid set — which makes THIS form cluster-quadratic as n grows
    (cluster size ~ n/8). The production form is q151b, which sizes
    K ≈ sqrt(n) so per-vector candidate counts stay ~sqrt(n); q151b is
    machine-checked equal to this query when forced to K=8 (see
    tests/test_llm_ops.py)."""
    return _semdedup(spark, sf_dir, _SEM_K)


#: q151c oracle: the q151 SQL with the corpus view swapped for its
#: exact-vector-deduped form — textually derived so the two can never
#: drift (the q423b discipline).
_DUCK_SEMDEDUP_FUNNEL = _DUCK_SEMDEDUP.replace(
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),",
    "WITH v AS (SELECT min(vec_id) AS vec_id, e FROM (SELECT vec_id,"
    " embedding::DOUBLE[] AS e FROM embeddings) GROUP BY e),",
)
assert _DUCK_SEMDEDUP_FUNNEL != _DUCK_SEMDEDUP


@register("q151c_semdedup_funnel", _DUCK_SEMDEDUP_FUNNEL)
def q151c_semdedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q151 behind the funnel ordering: exact VECTOR dedup first (the
    q26 min-id survivor rule keyed on the embedding value), then
    SemDeDup on the collapsed corpus — the embedding-space twin of
    q423b. Motivated by measurement, not caution: on 10x replicated
    embeddings q151's fixture sizing degrades to 199.6s because exact
    duplicate vectors concentrate inside single clusters and the
    within-cluster pair pass grows with the square of per-cluster
    replication; the dedup stage removes the concentration by
    construction, restoring ~1x cost on the same corpus (SCALE.md r9
    ANN table). On an already-unique corpus this is q151 plus one
    no-op-sized aggregate.

    100 TB shape: one vector-value-keyed exchange (digest-keyed in
    production) + the q151 cluster-bucketed pipeline on the shrunken
    corpus."""
    return _semdedup(spark, sf_dir, _SEM_K, dedup_first=True)


@register("q151b_semdedup_scaled", None)  # K depends on n → rows-only
def q151b_semdedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at production sizing: K = ceil(sqrt(n)) deterministic
    centroids (the first ceil(sqrt(n)) vec_ids — same rule as q151,
    just sized to the corpus). Expected cluster size is then ~sqrt(n),
    so the within-cluster pairwise pass generates O(n * sqrt(n)) total
    candidates instead of q151's O(n^2 / 8) — per-vector work stays
    ~sqrt(n) at any corpus size (Abbas et al. 2023 use K in the tens of
    thousands for 100M-scale corpora for exactly this reason).

    Rows-only by design: K depends on count(n), which a fixed SQL
    oracle cannot name. Correctness is covered two ways in pytest:
    (1) the shared _semdedup pipeline forced to K=8 is machine-checked
    equal to q151's exact oracle-green output, and (2) a candidate-
    bound test asserts max per-cluster size stays O(sqrt(n)) on the
    fixture.

    100 TB notes: n comes from one count() over parquet footers
    (metadata-only, no scan). The K centroids remain a broadcast —
    K = sqrt(10^9) ≈ 32k rows of a ~100-dim vector ≈ 25 MB, still
    broadcastable; beyond that, switch assignment to a bucketed join
    on a coarse LSH prefix of the centroid (docstring contract, same
    shape as q53's IVF cells). Cluster id remains the one shuffle key;
    AQE skew-split handles lopsided clusters."""
    import math

    n = load_table(spark, sf_dir, "embeddings").count()
    k = max(2, math.isqrt(n - 1) + 1)  # ceil(sqrt(n)) without floats
    return _semdedup(spark, sf_dir, k)


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


_XL_T = 0.3  # cross-lingual threshold: translated/copied content is
#              noisier than same-lang dupes, so the bar sits lower


_DUCK_XL = f"""
    WITH d AS (
      SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents),
         s AS (
      SELECT doc_id, lang,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(
                         generate_series(1, len(toks) - 2),
                         i -> array_to_string(toks[i:i+2], ' ')))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM d),
         sz AS (SELECT doc_id, lang, len(sh) AS sz FROM s),
         inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM inv a JOIN inv b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
         xl AS (
      SELECT least(sa.lang, sb.lang) AS lang_a,
             greatest(sa.lang, sb.lang) AS lang_b,
             round(shared / (sa.sz + sb.sz - shared), 4) AS jac
      FROM shared
      JOIN sz sa ON id_a = sa.doc_id
      JOIN sz sb ON id_b = sb.doc_id
      WHERE sa.lang <> sb.lang
        AND round(shared / (sa.sz + sb.sz - shared), 4) >= {_XL_T})
    SELECT lang_a, lang_b,
           count(*) AS n_pairs,
           CAST(round(10000 * max(jac)) AS BIGINT) AS max_jac_bp
    FROM xl
    GROUP BY lang_a, lang_b
    ORDER BY lang_a, lang_b
"""


@register("q253_crosslingual_dupes", _DUCK_XL)
def q253_crosslingual_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-lingual duplicate mining — near-dup pairs whose documents
    carry DIFFERENT language tags, censused per language pair: the
    signal behind parallel-corpus mining (translated content worth
    aligning), cross-lingual benchmark contamination, and mislabeled
    language tags (high-Jaccard cross-lang pairs of identical text are
    usually lang-ID errors, not translations). Reuses q27's
    inverted-index all-pairs machinery — the shingle join is
    lang-blind, the lang constraint applies at pair level — with a
    lower threshold (0.3) because copied-then-edited content across
    languages shares fewer exact shingles.

    Scale shape is exactly q27's (one posting-list pipeline, never
    corpus-quadratic) plus a broadcast of the doc→lang map onto the
    surviving pairs; the census output is bounded by |langs|².
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "text", "doc_id", n=3, threshold=_XL_T)
    langs = docs.select("doc_id", "lang")
    la = langs.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("la"))
    lb = langs.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lb"))
    xl = (
        pairs.join(F.broadcast(la), "id_a")
        .join(F.broadcast(lb), "id_b")
        .filter(F.col("la") != F.col("lb"))
        .select(
            F.least("la", "lb").alias("lang_a"),
            F.greatest("la", "lb").alias("lang_b"),
            "jaccard",
        )
    )
    return (
        xl.groupBy("lang_a", "lang_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(10000 * F.max("jaccard")).cast("bigint").alias("max_jac_bp"),
        )
        .orderBy("lang_a", "lang_b")
    )


@register(
    "q257_dup_cluster_sizes",
    _DUCK_CLUSTERS.replace(
        "SELECT id, min(label) AS cluster FROM reach GROUP BY id",
        """, labels AS (
      SELECT id, min(label) AS cluster FROM reach GROUP BY id),
         sizes AS (
      SELECT cluster, count(*) AS sz FROM labels GROUP BY cluster)
    SELECT sz AS cluster_size,
           count(*) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(sum(sz - 1) AS BIGINT) AS n_removable
    FROM sizes
    GROUP BY sz
    ORDER BY sz""",
    ).replace("         shared AS (", "         shared AS ("),
)
def q257_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size census — the dedup REPORT a curator
    reads before pulling the trigger: for each near-dup cluster size,
    how many clusters exist, how many documents they hold, and how
    many rows min-id survivorship would remove (Σ(size−1)) — the
    deletion budget and the long-tail/mega-cluster split in one
    table (a single mega-cluster usually means boilerplate, not true
    duplication, and deserves inspection rather than deletion).

    Composition: q27's pair pipeline → q49's connected components →
    one size rollup; everything after the pair stage is
    cluster-cardinality-sized. The oracle extends q49's recursive-CTE
    transitive closure with the same rollup, so the whole chain stays
    value-hash-checked.
    """
    from ooh_etl_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    labels = connected_components(pairs)
    sizes = labels.groupBy("cluster").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy(F.col("sz").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").cast("bigint").alias("n_docs"),
            F.sum(F.col("sz") - 1).cast("bigint").alias("n_removable"),
        )
        .orderBy("cluster_size")
    )


_CONT_T = 0.8  # containment threshold: B mostly inside A


@register(
    "q268_containment_pairs",
    f"""
    WITH d AS (
      SELECT doc_id, {{_DUCK_TOKS}} AS toks FROM documents),
         s AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(
                         generate_series(1, len(toks) - 2),
                         i -> array_to_string(toks[i:i+2], ' ')))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM d),
         sz AS (SELECT doc_id, len(sh) AS sz FROM s),
         inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM inv a JOIN inv b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(shared AS BIGINT) AS shared,
           CAST(round(10000.0 * shared / least(sa.sz, sb.sz)) AS BIGINT)
             AS containment_bp,
           CAST(round(10000.0 * shared / (sa.sz + sb.sz - shared))
                AS BIGINT) AS jaccard_bp
    FROM shared
    JOIN sz sa ON id_a = sa.doc_id
    JOIN sz sb ON id_b = sb.doc_id
    WHERE round(10000.0 * shared / least(sa.sz, sb.sz)) >= {_CONT_T * 10000:.0f}
    ORDER BY id_a, id_b
    """.replace("{_DUCK_TOKS}", _DUCK_TOKS),
)
def q268_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINMENT near-dup pairs (Broder 1997's second resemblance
    measure): |A∩B| / min(|A|,|B|) catches the subset relationship
    Jaccard misses — a short document quoted inside a long one scores
    near 1.0 containment but low Jaccard, and quote/excerpt dedup is
    exactly the case corpus cleaners lose when they threshold only on
    Jaccard. Emits both measures so the divergence (high containment,
    low Jaccard) is visible per pair.

    Shape: identical to q27's inverted-index pipeline — the shared
    counts are the same aggregate; only the normalization differs (min
    size instead of union size), so the scale argument carries over
    verbatim.
    """
    docs = load_table(spark, sf_dir, "documents")
    from ooh_etl_spark.functions.text import tokenize

    toks = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    sh = toks.select(
        "doc_id",
        F.when(
            F.size("toks") >= 3,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 2),
                    lambda i: F.array_join(
                        F.slice(F.col("toks"), i, 3), " "
                    ),
                )
            ),
        )
        .otherwise(F.array(F.array_join(F.col("toks"), " ")))
        .alias("sh"),
    ).localCheckpoint()  # shingle sets feed the size table AND both
    # inverted-index sides (the tokenize pass ran 4x otherwise)
    sz = sh.select("doc_id", F.size("sh").alias("sz"))
    inv = sh.select("doc_id", F.explode("sh").alias("shingle"))
    a = inv.select(F.col("doc_id").alias("id_a"), "shingle")
    b = inv.select(F.col("doc_id").alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sz.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sza"))
    sb = sz.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("szb"))
    cont = F.round(
        10000.0 * F.col("shared") / F.least("sza", "szb")
    ).cast("bigint")
    jac = F.round(
        10000.0 * F.col("shared") / (F.col("sza") + F.col("szb") - F.col("shared"))
    ).cast("bigint")
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("shared").cast("bigint").alias("shared"),
            cont.alias("containment_bp"),
            jac.alias("jaccard_bp"),
        )
        .filter(F.col("containment_bp") >= int(_CONT_T * 10000))
        .orderBy("id_a", "id_b")
    )


# --- q291: sorted-suffix LCP profile (suffix-array substring dedup) ------
_SUF_TOKENS = 8  # suffix window: 8 tokens, clipped to 40 chars
_SUF_CHARS = 40
_SUF_MIN_LCP = 10  # report cross-doc adjacencies sharing >= 10 chars

_DUCK_SUFFIX_LCP = f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
         suf AS (
      SELECT doc_id, i AS pos,
             substr(array_to_string(t[i:i+{_SUF_TOKENS - 1}], ' '),
                    1, {_SUF_CHARS}) AS suffix
      FROM toks, unnest(generate_series(1, len(t))) AS u(i)),
         adj AS (
      SELECT doc_id, suffix,
             lag(suffix) OVER w AS prev_suffix,
             lag(doc_id) OVER w AS prev_doc
      FROM suf
      WINDOW w AS (PARTITION BY substr(suffix, 1, 2)
                   ORDER BY suffix, doc_id, pos)),
         lcps AS (
      SELECT doc_id, prev_doc,
             5 * list_max(list_transform(
               generate_series(1, {_SUF_CHARS} // 5),
               b -> CASE WHEN substr(suffix, 1, 5 * b)
                            = substr(prev_suffix, 1, 5 * b)
                         THEN b ELSE 0 END)) AS lcp_bucket
      FROM adj WHERE prev_suffix IS NOT NULL AND prev_doc <> doc_id)
    SELECT CAST(lcp_bucket AS BIGINT) AS lcp_bucket,
           count(*) AS n_pairs,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM lcps WHERE lcp_bucket >= {_SUF_MIN_LCP}
    GROUP BY 1 ORDER BY lcp_bucket
"""


@register("q291_suffix_lcp_profile", _DUCK_SUFFIX_LCP)
def q291_suffix_lcp_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-suffix adjacency LCP profile — the core step of
    suffix-array substring deduplication (Lee et al., ACL 2022,
    EXACTSUBSTR): emit a bounded suffix at every token position, sort
    all suffixes, and measure the longest common prefix of each
    ADJACENT pair from different documents (computed at 5-char block
    granularity — exactly the histogram's bucket width, so no
    precision is lost and the compare count drops 5x). Long-LCP
    adjacencies are exactly the duplicated substrings a suffix array
    surfaces; the histogram (5-char buckets, >= {_SUF_MIN_LCP} chars) is the
    corpus-level contamination profile that decides the removal
    threshold before running q152/q163's span removal.

    Differs from q152 (fixed-n n-gram spans): the suffix sort finds
    duplication at ANY length >= the threshold in one pass, which is
    the reason the literature builds suffix arrays instead of scanning
    one n at a time.

    100 TB shape: the sort is expressed as a window PARTITIONED by the
    2-char suffix prefix — suffixes agreeing on < 2 chars can never
    reach the {_SUF_MIN_LCP}-char threshold, so bucketing by prefix
    loses no reportable pair while turning a global total order (one
    task) into an embarrassingly parallel per-bucket sort — the
    standard prefix-bucket distribution of suffix-array construction.
    Skewed buckets (a hot 2-char prefix) split further by widening the
    prefix, the same escalation DC3/prefix-doubling uses. Suffix
    payloads are clipped to {_SUF_CHARS} chars so the shuffle carries
    O(corpus tokens x {_SUF_CHARS}) bytes, not O(doc^2).
    """
    from ooh_etl_spark.functions.text import tokenize
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    suf = (
        docs.select("doc_id", tokenize(F.col("text")).alias("t"))
        .select("doc_id", "t", F.posexplode("t").alias("p", "_tok"))
        .select(
            "doc_id",
            (F.col("p") + 1).alias("pos"),
            F.substring(
                F.array_join(F.slice("t", F.col("p") + 1, _SUF_TOKENS), " "),
                1,
                _SUF_CHARS,
            ).alias("suffix"),
        )
    )
    w = Window.partitionBy(F.substring("suffix", 1, 2)).orderBy(
        "suffix", "doc_id", "pos"
    )
    adj = suf.select(
        "doc_id",
        "suffix",
        F.lag("suffix").over(w).alias("prev_suffix"),
        F.lag("doc_id").over(w).alias("prev_doc"),
    ).filter(
        F.col("prev_suffix").isNotNull() & (F.col("prev_doc") != F.col("doc_id"))
    )
    # Bucketed LCP: the histogram floors lcp to 5-char buckets, and
    # prefix equality is monotone in length, so the bucket equals
    # 5 x (leading equal 5-char blocks) — 8 substring compares per
    # adjacent pair instead of 40 (-45% wall on the sf0.1 bench).
    # r13 opt (guide §4.1): the compares were an array_max(transform(
    # sequence...)) higher-order fold — CodegenFallback, interpreted
    # per pair. Monotonicity means the bucket is 5*(first differing
    # block - 1), so a static CASE chain from the SHORTEST block up is
    # equivalent, stays in whole-stage codegen, and short-circuits at
    # the first mismatch (most adjacent pairs share < 5 chars).
    n_blocks = _SUF_CHARS // 5
    lcp_case = "CASE " + " ".join(
        f"WHEN substr(suffix, 1, {5 * b}) <> substr(prev_suffix, 1, {5 * b})"
        f" THEN {5 * (b - 1)}"
        for b in range(1, n_blocks + 1)
    ) + f" ELSE {5 * n_blocks} END"
    lcps = adj.withColumn("lcp_bucket", F.expr(lcp_case)).filter(
        F.col("lcp_bucket") >= _SUF_MIN_LCP
    )
    return (
        lcps.groupBy(
            F.col("lcp_bucket").cast("bigint").alias("lcp_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy("lcp_bucket")
    )


# --- q327: normalization-layer exact dedup (round 6) -----------------------
_DUCK_NORM_DEDUP = """
    WITH n AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               AS norm_key
      FROM documents),
         g AS (
      SELECT norm_key, count(*) AS n_copies, min(doc_id) AS survivor
      FROM n GROUP BY norm_key)
    SELECT CAST(n_copies AS BIGINT) AS n_copies,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(survivor) AS BIGINT) AS min_survivor
    FROM g GROUP BY 1 ORDER BY n_copies
"""


@register("q327_normalized_exact_dedup", _DUCK_NORM_DEDUP)
def q327_normalized_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-layer exact dedup — the cheap middle rung between
    byte-exact dedup (q26) and shingle similarity (q27) that
    production corpus cleaners run FIRST (C4 lowercased before
    dedup; Dolma/RefinedWeb normalize whitespace): two documents that
    differ only in case or whitespace runs are duplicates, caught by
    grouping on md5(lower(whitespace-collapsed text)). Output is the
    copy-count profile with the min-id survivor rule (q26's
    convention), so the oracle proves group membership, not just
    counts.

    100 TB shape: the normalization is a per-row map fused into the
    scan stage; the ONLY shuffle keys on the 128-bit digest (never
    the text itself — bytes on the wire are 32 hex chars per doc
    regardless of document length, the reason to hash BEFORE the
    exchange). Identical plan to q26 with a richer key function; the
    normalization ladder extends per-corpus (Unicode NFKC,
    punctuation strip) by swapping the key expression only."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.select(
        "doc_id",
        F.md5(
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
        ).alias("norm_key"),
    )
    g = n.groupBy("norm_key").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("survivor"),
    )
    return (
        g.groupBy(F.col("n_copies").cast("bigint").alias("n_copies"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.min("survivor").cast("bigint").alias("min_survivor"),
        )
        .orderBy("n_copies")
    )


# --- q345: dedup threshold sweep (round 6) ---------------------------------
_SWEEP_TS = (5000, 6000, 7000, 8000, 9000)  # Jaccard thresholds, bp

_DUCK_SWEEP = f"""
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
      GROUP BY 1, 2),
         pairs AS (
      SELECT id_a, id_b,
             CAST(round(10000.0 * shared / (sa.sz + sb.sz - shared))
                  AS BIGINT) AS j_bp
      FROM shared JOIN sz sa ON id_a = sa.doc_id
                  JOIN sz sb ON id_b = sb.doc_id),
         grid AS (SELECT unnest([{", ".join(str(t) for t in _SWEEP_TS)}]) AS t_bp),
         n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT CAST(grid.t_bp AS BIGINT) AS threshold_bp,
           CAST(count(*) FILTER (WHERE pairs.j_bp >= grid.t_bp) AS BIGINT)
             AS n_pairs,
           CAST(count(DISTINCT CASE WHEN pairs.j_bp >= grid.t_bp
                                    THEN pairs.id_b END) AS BIGINT)
             AS n_dropped,
           CAST(round(10000.0 * (n.n_docs - count(DISTINCT
                 CASE WHEN pairs.j_bp >= grid.t_bp THEN pairs.id_b END))
                 / n.n_docs) AS BIGINT) AS survival_bp
    FROM grid CROSS JOIN n LEFT JOIN pairs ON true
    GROUP BY grid.t_bp, n.n_docs
    ORDER BY threshold_bp
"""


@register("q345_dedup_threshold_sweep", _DUCK_SWEEP)
def q345_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold sweep — the yield curve a corpus curator reads
    before committing to a similarity cutoff (Lee et al. 2022 report
    exactly this sensitivity): candidate pairs and their Jaccard are
    computed ONCE (the q27 inverted-index pipeline, with the filter
    REMOVED so sub-threshold pairs survive to the sweep), then every
    threshold in the grid is evaluated from the same checkpointed
    pair table — pairs kept, docs dropped (min-id survivor rule), and
    corpus survival rate per threshold. The expensive stage runs
    once; the sweep is |grid| cheap aggregates.

    100 TB shape: identical candidate-generation cost to q27 (the
    sweep adds a broadcast grid join over the pair table only) — the
    whole point: tuning the threshold costs one extra bounded pass,
    not one dedup run per candidate value."""
    from ooh_etl_spark.operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    # threshold=0.0 keeps every candidate pair (>=1 shared shingle)
    pairs = (
        jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.0)
        .select(
            "id_a",
            "id_b",
            F.round(10000.0 * F.col("jaccard")).cast("bigint").alias("j_bp"),
        )
        .localCheckpoint()  # one pair computation feeds every threshold
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    grid = spark.createDataFrame(
        [(t,) for t in _SWEEP_TS], "t_bp long"
    )
    swept = (
        pairs.crossJoin(F.broadcast(grid))
        .groupBy("t_bp")
        .agg(
            F.sum(F.when(F.col("j_bp") >= F.col("t_bp"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pairs"),
            F.countDistinct(
                F.when(F.col("j_bp") >= F.col("t_bp"), F.col("id_b"))
            )
            .cast("bigint")
            .alias("n_dropped"),
        )
    )
    return (
        F.broadcast(grid)
        .join(swept, "t_bp", "left")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("t_bp").cast("bigint").alias("threshold_bp"),
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias("n_dropped"),
            F.round(
                10000.0
                * (F.col("n_docs") - F.coalesce("n_dropped", F.lit(0)))
                / F.col("n_docs")
            )
            .cast("bigint")
            .alias("survival_bp"),
        )
        .orderBy("threshold_bp")
    )


# --- q350: incremental cross-batch dedup (round 6) -------------------------
_INC_SPLIT_FRAC = 10  # last tenth of doc_ids arrives as the "new batch"

_DUCK_INC_DEDUP = f"""
    WITH mx AS (SELECT (max(doc_id) + 1) * ({_INC_SPLIT_FRAC} - 1)
                       // {_INC_SPLIT_FRAC} AS cut FROM documents),
         d AS (
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
         old AS (SELECT inv.* FROM inv CROSS JOIN mx WHERE doc_id < cut),
         new AS (SELECT inv.* FROM inv CROSS JOIN mx WHERE doc_id >= cut),
         shared AS (
      SELECT old.doc_id AS id_old, new.doc_id AS id_new, count(*) AS shared
      FROM new JOIN old USING (shingle)
      GROUP BY 1, 2),
         pairs AS (
      SELECT id_new, id_old
      FROM shared JOIN sz so ON id_old = so.doc_id
                  JOIN sz sn ON id_new = sn.doc_id
      WHERE round(shared / (so.sz + sn.sz - shared), 4) >= 0.5)
    SELECT id_new AS new_doc_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(id_old) AS BIGINT) AS kept_doc_id
    FROM pairs GROUP BY id_new ORDER BY new_doc_id
"""


@register("q350_incremental_dedup", _DUCK_INC_DEDUP)
def q350_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup dedup — the production shape q27 is the
    offline twin of: a new ingest batch (the last tenth of doc_ids)
    checks ONLY against the existing corpus index, never re-pairing
    old-vs-old (Lee et al. 2022 §5 run exactly this daily). The
    existing side's shingle inverted index is the persisted artifact;
    the new batch's shingles probe it; candidates are new x old only,
    so incremental cost scales with the BATCH, not the corpus.
    Output: each new doc's match count and its min-id survivor (the
    doc a dedupe would keep instead).

    100 TB shape: the probe join shuffles on the shingle key with the
    new side a few orders smaller — the classic big-probe-small
    pattern; at production the old-side postings are bucketed on
    shingle so the probe co-partitions with ZERO old-side movement
    (the persisted-index property this query's plan stands in for);
    the verify join re-attaches sizes by key."""
    from ooh_etl_spark.functions.text import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    cut_row = docs.agg(
        (
            (F.max("doc_id") + 1)
            * (_INC_SPLIT_FRAC - 1)
            / _INC_SPLIT_FRAC
        )
        .cast("bigint")
        .alias("cut")
    ).collect()[0]
    cut = int(cut_row["cut"])
    sh = docs.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("sh")
    ).localCheckpoint()  # shingle sets feed index, probe, and sizes
    sz = sh.select("doc_id", F.size("sh").alias("sz"))
    inv = sh.select("doc_id", F.explode("sh").alias("shingle"))
    old = inv.filter(F.col("doc_id") < cut).select(
        F.col("doc_id").alias("id_old"), "shingle"
    )
    new = inv.filter(F.col("doc_id") >= cut).select(
        F.col("doc_id").alias("id_new"), "shingle"
    )
    shared = (
        new.join(old, "shingle")
        .groupBy("id_new", "id_old")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    so = sz.select(F.col("doc_id").alias("id_old"), F.col("sz").alias("szo"))
    sn = sz.select(F.col("doc_id").alias("id_new"), F.col("sz").alias("szn"))
    pairs = (
        shared.join(so, "id_old")
        .join(sn, "id_new")
        .filter(
            F.round(
                F.col("shared")
                / (F.col("szo") + F.col("szn") - F.col("shared")),
                4,
            )
            >= 0.5
        )
    )
    return (
        pairs.groupBy(F.col("id_new").alias("new_doc_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matches"),
            F.min("id_old").cast("bigint").alias("kept_doc_id"),
        )
        .orderBy("new_doc_id")
    )


# --- q379: sparse TF-IDF cosine near-dup pairs (round 6) --------------------
_SPARSE_COS_MIN_BP = 9000  # report pairs with cosine >= 0.90

_DUCK_SPARSE_COS = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents),
         tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE w <> '' GROUP BY 1, 2),
         n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
         idf AS (
      SELECT w, ln(n_docs.n * 1.0 / count(DISTINCT doc_id)) AS idf
      FROM tf CROSS JOIN n_docs GROUP BY w, n_docs.n),
         vec AS (
      SELECT tf.doc_id, tf.w,
             CAST(round(1000000 * tf.tf * idf.idf) AS BIGINT) AS x_u
      FROM tf JOIN idf USING (w) WHERE round(1000000 * tf.tf * idf.idf) > 0),
         nrm AS (
      SELECT doc_id,
             sqrt(CAST(sum(CAST(x_u AS HUGEINT) * x_u) AS DOUBLE)) AS nv
      FROM vec GROUP BY doc_id),
         dots AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(sum(CAST(a.x_u AS HUGEINT) * b.x_u) AS DOUBLE) AS dot
      FROM vec a JOIN vec b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
         scored AS (
      SELECT dots.da, dots.db,
             CAST(round(10000 * dots.dot / (na.nv * nb.nv)) AS BIGINT)
               AS cos_bp
      FROM dots JOIN nrm na ON na.doc_id = dots.da
                JOIN nrm nb ON nb.doc_id = dots.db)
    SELECT da, db, cos_bp FROM scored
    WHERE cos_bp >= {_SPARSE_COS_MIN_BP}
    ORDER BY da, db
"""


@register("q379_sparse_cosine_pairs", _DUCK_SPARSE_COS)
def q379_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-weighted cosine near-duplicate pairs via the inverted
    index (Bayardo/Ma/Srikant WWW'07 'all-pairs similarity search';
    the sparse-retrieval scoring shape behind SPLADE/BM25 hybrids):
    document pairs share score mass ONLY through shared terms, so the
    pairwise dot products come from a posting-list self-join on the
    term key — never a doc x doc cross product — and q27's unweighted
    Jaccard gains the IDF weighting that stops stopword-heavy docs
    from looking like duplicates.

    Exactness: tf and df are integers; tf*idf quantizes to micro per
    (doc, term) BEFORE any sum; dots and norms are exact wide-integer
    sums of micro products (HUGEINT / decimal(38,0)) and the cosine
    touches doubles once per pair.

    100 TB shape: two term-keyed aggregates (tf, idf — both map-side
    combinable) and ONE posting-list self-join co-partitioned on the
    term key; hot terms (stopwords) are exactly the rows IDF already
    down-weights, and the classic escalation (drop df > threshold
    postings — prefix filtering per Bayardo) is documented, not
    needed at this vocab."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).filter(F.col("w") != "")
    tf = tok.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    n_docs = tf.select("doc_id").distinct().count()
    idf = tf.groupBy("w").agg(
        F.log(F.lit(float(n_docs)) / F.countDistinct("doc_id")).alias("idf")
    )
    vec = (
        tf.join(idf, "w")
        .select(
            "doc_id",
            "w",
            F.round(1000000 * F.col("tf") * F.col("idf")).cast("bigint").alias("x_u"),
        )
        .filter(F.col("x_u") > 0)
        .localCheckpoint()
    )
    nrm = vec.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(F.col("x_u").cast("decimal(38,0)") * F.col("x_u")).cast("double")
        ).alias("nv")
    )
    a = vec.select(F.col("doc_id").alias("da"), "w", F.col("x_u").alias("xa"))
    b = vec.select(F.col("doc_id").alias("db"), F.col("w").alias("wb"), F.col("x_u").alias("xb"))
    dots = (
        a.join(b, (F.col("w") == F.col("wb")) & (F.col("da") < F.col("db")))
        .groupBy("da", "db")
        .agg(
            F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb"))
            .cast("double")
            .alias("dot")
        )
    )
    return (
        dots.join(F.broadcast(nrm.withColumnRenamed("doc_id", "da").withColumnRenamed("nv", "na")), "da")
        .join(F.broadcast(nrm.withColumnRenamed("doc_id", "db").withColumnRenamed("nv", "nb")), "db")
        .select(
            "da",
            "db",
            F.round(10000 * F.col("dot") / (F.col("na") * F.col("nb")))
            .cast("bigint")
            .alias("cos_bp"),
        )
        .filter(F.col("cos_bp") >= _SPARSE_COS_MIN_BP)
        .orderBy("da", "db")
    )


# --- q392: cross-source shingle overlap matrix (round 6) --------------------
_SRC_SHINGLE_N = 5  # word shingle width

_DUCK_SRC_OVERLAP = f"""
    WITH d AS (
      SELECT source, string_split(lower(text), ' ') AS toks
      FROM documents),
         sh AS (
      SELECT DISTINCT source,
             md5(array_to_string(toks[x:x + {_SRC_SHINGLE_N} - 1], ' ')) AS h
      FROM d CROSS JOIN LATERAL (
        SELECT unnest(range(1, len(toks) - {_SRC_SHINGLE_N} + 2)) AS x)),
         per_src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_shingles
      FROM sh GROUP BY source),
         co AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS co
      FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2)
    SELECT co.src_a, co.src_b, co.co,
           pa.n_shingles AS n_a, pb.n_shingles AS n_b,
           CAST(round(10000.0 * co.co
                / (pa.n_shingles + pb.n_shingles - co.co)) AS BIGINT)
             AS jaccard_bp
    FROM co JOIN per_src pa ON pa.source = co.src_a
            JOIN per_src pb ON pb.source = co.src_b
    WHERE co.co > 0
    ORDER BY jaccard_bp DESC, src_a, src_b
"""


@register("q392_source_overlap_matrix", _DUCK_SRC_OVERLAP)
def q392_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix via 5-gram shingle Jaccard
    (Broder, SEQUENCES 1997 resemblance — applied between SOURCES, not
    documents): which pairs of corpus sources share verbatim text
    mass? The corpus-governance audit that catches a crawl source
    mirroring another (and the cross-SOURCE sibling of q81's
    train-vs-benchmark decontamination); run before q83/q164 assign
    mixture weights that double-count mirrored content.

    Exactness: shingle sets are md5-keyed (engine-portable); all
    counts are integers; Jaccard is one final ratio.

    100 TB shape: shingling is a narrow per-doc transform; ONE
    distinct on (source, shingle) — map-side combinable; the
    co-occurrence self-join is keyed on the SHINGLE and bounded by
    |sources|^2 output and per-key fan-out <= |sources|, never
    doc-quadratic. Per-source totals reuse the same distinct table
    (checkpointed)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    # NOTE: Spark's sequence(1, 0) is DESCENDING, not empty — docs
    # shorter than the shingle width must be filtered BEFORE sequence()
    sh = (
        docs.filter(
            F.size(F.split(F.lower(F.col("text")), " ")) >= _SRC_SHINGLE_N
        )
        .select(
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(split(lower(text), ' ')) - {_SRC_SHINGLE_N} + 1),"
                    f" x -> array_join(slice(split(lower(text), ' '), x, {_SRC_SHINGLE_N}), ' '))"
                )
            ).alias("g"),
        )
        .select("source", F.md5(F.col("g")).alias("h"))
        .distinct()
        .localCheckpoint()
    )
    per_src = sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    a = sh.select(F.col("source").alias("src_a"), "h")
    b = sh.select(F.col("source").alias("src_b"), F.col("h").alias("hb"))
    co = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("src_a") < F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
    )
    return (
        co.join(
            F.broadcast(
                per_src.select(
                    F.col("source").alias("src_a"), F.col("n_shingles").alias("n_a")
                )
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                per_src.select(
                    F.col("source").alias("src_b"), F.col("n_shingles").alias("n_b")
                )
            ),
            "src_b",
        )
        .filter(F.col("co") > 0)
        .select(
            "src_a",
            "src_b",
            "co",
            "n_a",
            "n_b",
            F.round(10000.0 * F.col("co") / (F.col("n_a") + F.col("n_b") - F.col("co")))
            .cast("bigint")
            .alias("jaccard_bp"),
        )
        .orderBy(F.desc("jaccard_bp"), "src_a", "src_b")
    )


# --- q417: winnowing fingerprints (round 7) ----------------------------------
_WIN_K = 8  # char k-gram width
_WIN_W = 4  # winnowing window (k-grams per window)

_DUCK_WINNOW = f"""
    WITH d AS (
      SELECT doc_id, source, lower(text) AS t, length(text) AS L
      FROM documents WHERE length(text) >= {_WIN_K + _WIN_W - 1}),
         fps AS (
      SELECT doc_id, source,
             list_distinct(list_transform(range(1, L - {_WIN_K + _WIN_W} + 3),
               j -> list_min(list_transform(range(j, j + {_WIN_W}),
                      i -> substr(md5(substr(t, CAST(i AS INT), {_WIN_K})),
                                  1, 16))))) AS fp
      FROM d),
         tall AS (SELECT doc_id, source, unnest(fp) AS fp FROM fps),
         nd AS (
      SELECT doc_id, source, fp,
             count(*) OVER (PARTITION BY fp) AS nd
      FROM tall)
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_fps,
           CAST(count(DISTINCT fp) AS BIGINT) AS distinct_fps,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS xdoc_fps
    FROM nd GROUP BY source ORDER BY source
"""


@register("q417_winnowing_fingerprints", _DUCK_WINNOW)
def q417_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash every
    {_WIN_K}-char gram, slide a window of {_WIN_W} consecutive hashes,
    and keep each window's MINIMUM — the guarantee is that any shared
    substring of length >= k + w - 1 contributes at least one SHARED
    fingerprint, so cross-document overlap is detectable from ~1/w of
    the grams. Output is the per-source fingerprint census: how many
    fingerprints each source carries, how many are distinct, and how
    many collide with another document anywhere in the corpus — the
    winnowed analog of q27's full posting census.

    Exactness: fingerprints are md5 hex strings (the window min is a
    lexicographic string min — identical in both engines); all outputs
    are integer counts.

    100 TB shape: gram hashing is scan-stage codegen (explode + md5 —
    each gram hashed ONCE); the window min is a doc-partitioned sliding
    frame (one doc-keyed exchange, the q163 per-doc-sort shape); then
    the fingerprint-keyed census aggregate and the per-source rollup —
    the q27 exchanges with the wire volume cut ~w-fold by winnowing's
    sampling guarantee. Window width w trades recall granularity
    against index size exactly as published. (A pure array-lambda
    form — transform/array_min, zero pre-census shuffle — was measured
    12x SLOWER here: Spark evaluates higher-order-function lambdas
    interpreted, so the per-gram md5 left whole-stage codegen.
    parallelize_rows fans the single-file fixture out so the explode
    and the dedup's partial aggregates parallelize — measured 4.3s ->
    0.8s at sf0.1; no-ops at production split counts.)"""
    from pyspark.sql import Window  # noqa: PLC0415

    from ooh_etl_spark.tables import parallelize_rows  # noqa: PLC0415

    docs = parallelize_rows(load_table(spark, sf_dir, "documents"))
    k, w = _WIN_K, _WIN_W
    grams = docs.filter(F.length("text") >= k + w - 1).select(
        "doc_id",
        "source",
        "text",
        (F.length("text") - (k + w) + 2).alias("last_j"),
        F.explode(F.sequence(F.lit(1), F.length("text") - k + 1)).alias("i"),
    ).select(
        "doc_id",
        "source",
        "i",
        "last_j",
        F.expr(f"substring(md5(substring(lower(text), i, {k})), 1, 16)").alias("h"),
    )
    win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    tall = (
        grams.select(
            "doc_id",
            "source",
            "i",
            "last_j",
            F.min("h").over(win).alias("fp"),
        )
        .filter(F.col("i") <= F.col("last_j"))
        .select("doc_id", "source", "fp")
        .distinct()
    )
    # cross-doc census WITHOUT a self-join: tall is doc-distinct, so a
    # row count per fingerprint partition == documents carrying it (a
    # fp-keyed window beats groupBy + sort-merge-join back on a string
    # key — measured 6.3s -> ~2s at sf0.1)
    # Census WITHOUT countDistinct: two countDistincts + two plain aggs
    # in one groupBy plan an Expand that reprocesses the multi-million-
    # row (doc, fp) table 3x. Instead: (a) flag exactly one row per doc
    # (its lexicographic-min fingerprint) with a doc-partitioned window
    # min BEFORE the fp re-shuffle — this adds NO exchange because the
    # gram window's HashPartitioning(doc_id) satisfies BOTH the
    # distinct's ClusteredDistribution(doc_id, source, fp) (subset
    # rule: hash keys ⊆ clustering keys) and the doc-rep window's
    # doc_id distribution, so Spark replans neither (verified: the
    # executed plan has exactly ONE doc_id exchange; pinned in
    # tests/test_plans.py::test_q417_single_scan_no_expand_no_join) —
    # and lets n_docs ride the same aggregation tree instead of a
    # second corpus scan; (b) pre-aggregate per (source, fp) —
    # satisfied in-place by the fp window's partitioning — so
    # distinct_fps is a plain count and xdoc_fps a plain sum.
    # Plan: zero Expand, zero joins, ONE corpus scan. (At sf0.1 the
    # delta is inside run noise — the win is the removed 3x Expand
    # reprocessing and re-scan, which scale with corpus volume.)
    doc_min = F.min("fp").over(Window.partitionBy("doc_id"))
    flagged = tall.select(
        "doc_id",
        "source",
        "fp",
        (F.col("fp") == doc_min).cast("int").alias("is_doc_rep"),
    )
    nd = flagged.select(
        "source",
        "fp",
        "is_doc_rep",
        F.count(F.lit(1)).over(Window.partitionBy("fp")).alias("nd"),
    )
    per_fp = nd.groupBy("source", "fp").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum((F.col("nd") > 1).cast("int")).alias("x_cnt"),
        F.sum("is_doc_rep").alias("n_rep"),
    )
    return (
        per_fp.groupBy("source")
        .agg(
            F.sum("n_rep").cast("bigint").alias("n_docs"),
            F.sum("cnt").cast("bigint").alias("n_fps"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_fps"),
            F.sum("x_cnt").cast("bigint").alias("xdoc_fps"),
        )
        .select("source", "n_docs", "n_fps", "distinct_fps", "xdoc_fps")
        .orderBy("source")
    )


# --- q418: content-defined chunking + sub-doc chunk dedup (round 7) ----------
_CDC_K = 16  # rolling-window width for the boundary test
# boundary predicate: first md5 hex nibble == '0'  (P = 1/16 -> expected
# chunk ~16 chars at this fixture; widen the mask at production corpus
# sizes exactly as LBFS/FastCDC tune their average block size)

_DUCK_CDC = f"""
    WITH d AS (
      SELECT doc_id, source, text AS t, length(text) AS L FROM documents),
         b AS (
      SELECT doc_id, source, t, L,
             list_concat(list_concat(
               [CAST(0 AS BIGINT)],
               list_filter(range({_CDC_K}, L + 1),
                 i -> substr(md5(substr(t, CAST(i - {_CDC_K - 1} AS INT),
                                        {_CDC_K})), 1, 1) = '0')),
               [CAST(L AS BIGINT)]) AS bp
      FROM d),
         ch AS (
      SELECT doc_id, source,
             list_filter(
               list_transform(range(1, len(bp)),
                 x -> CASE WHEN bp[CAST(x + 1 AS INT)] > bp[CAST(x AS INT)]
                      THEN md5(substr(t, CAST(bp[CAST(x AS INT)] + 1 AS INT),
                                      CAST(bp[CAST(x + 1 AS INT)]
                                           - bp[CAST(x AS INT)] AS INT)))
                      ELSE NULL END),
               h -> h IS NOT NULL) AS chunks
      FROM b),
         tall AS (SELECT doc_id, source, unnest(chunks) AS h FROM ch)
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT h) AS BIGINT) AS distinct_chunks,
           CAST(round(10000.0 * (count(*) - count(DISTINCT h)) / count(*))
                AS BIGINT) AS dup_bp
    FROM tall GROUP BY source ORDER BY source
"""


@register("q418_cdc_chunk_dedup", _DUCK_CDC)
def q418_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + sub-document chunk dedup (the LBFS
    anchor technique — Muthitacharoen, Chen & Mazières, SOSP 2001;
    refined by FastCDC, USENIX ATC 2016): a chunk boundary falls after
    position i exactly when the hash of the {_CDC_K}-char window
    ending at i satisfies the mask (first md5 nibble = 0, P=1/16), so
    boundaries are a function of CONTENT, not offset — an insertion
    reshuffles only the chunk it lands in, and byte-identical passages
    at different offsets in different documents still produce
    identical chunks. The census reports per-source chunk counts and
    the duplicate-chunk mass — the sub-document dedup ratio doc-level
    exact dedup (q26) cannot see and span removal (q163) measures
    token-wise.

    Exactness: boundaries and chunk digests are md5 hex strings from
    integer positions; outputs are integer counts and one basis-point
    rounding.

    100 TB shape: the boundary test is scan-stage codegen (position
    explode + md5 per window — each window hashed ONCE); chunk
    reconstruction is a doc-partitioned lag window over the ~L/16
    surviving boundary rows (the q163 per-doc-sort shape); then ONE
    digest-keyed census shuffle and the per-source rollup. The 1/16
    mask is the tunable: production dedup stores (Venti, ZFS dedup,
    restic) widen it to 2^-13..2^-20 for 8-64 KiB chunks; the plan
    shape is mask-independent. FastCDC's min/max clamps and
    gear-rotation are constant-factor refinements of the same shape.
    (An array-lambda form — boundary list + chunk transform per row —
    was measured 300x slower: interpreted HOF lambdas, plus projection
    collapse re-inlining the full boundary scan into every element_at
    reference. parallelize_rows fans the single-file fixture out so the
    position explode parallelizes; no-ops at production split counts.)"""
    from pyspark.sql import Window  # noqa: PLC0415

    from ooh_etl_spark.tables import parallelize_rows  # noqa: PLC0415

    docs = parallelize_rows(load_table(spark, sf_dir, "documents"))
    k = _CDC_K
    # one explode pass emits every candidate position 0..L plus keeps
    # only the sentinels (0, L) and the mask-satisfying interior
    # boundaries — no per-sentinel union re-scan of the corpus
    pos = docs.select(
        "doc_id",
        "source",
        "text",
        F.length("text").cast("bigint").alias("L"),
        F.explode(F.sequence(F.lit(0).cast("bigint"),
                             F.length("text").cast("bigint"))).alias("i"),
    )
    bnd = pos.filter(
        (F.col("i") == 0)
        | (F.col("i") == F.col("L"))
        | (
            (F.col("i") >= k)
            & (
                F.expr(
                    f"substring(md5(substring(text, int(i - {k - 1}), {k})), 1, 1)"
                )
                == "0"
            )
        )
    )
    # r13 opt (guide §2.3 "shuffle keys and metadata, not payloads"):
    # the boundary window previously carried the FULL text column, so
    # each document's text crossed the doc-keyed exchange once PER
    # SURVIVING BOUNDARY (~L/16 copies — O(L^2/16) shuffle bytes per
    # doc, quadratic in doc length at scale). Now the text is attached
    # ONLY to the i=0 sentinel row (every doc has one) and
    # reconstructed inside the window with a running
    # first_value(ignorenulls) over the same partition/order — one
    # copy per doc crosses the exchange, no join-back (a join-back
    # variant A/B-measured ~0.4s slower at sf0.1).
    win = Window.partitionBy("doc_id").orderBy("i")
    chunks = (
        bnd.select(
            "doc_id",
            "source",
            "i",
            F.when(F.col("i") == 0, F.col("text")).alias("t0"),
        )
        .select(
            "doc_id",
            "source",
            "i",
            F.lag("i").over(win).alias("prev"),
            F.first("t0", ignorenulls=True)
            .over(
                win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .alias("text"),
        )
        .filter(F.col("prev").isNotNull() & (F.col("i") > F.col("prev")))
        .select(
            "doc_id",
            "source",
            F.expr("md5(substring(text, int(prev + 1), int(i - prev)))").alias("h"),
        )
    )
    # (An Expand-free census rollup — (source, digest) pre-aggregate +
    # scan-side n_docs — was four-arm A/B-measured 0.45s SLOWER at
    # sf0.1 than this single groupBy: the Expand's 3x row replication
    # is linear and map-local, while the rollup added a whole extra
    # shuffle stage. Left as-is per guide §1.1.)
    return (
        chunks
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.countDistinct("h").cast("bigint").alias("distinct_chunks"),
            F.round(
                10000.0
                * (F.count(F.lit(1)) - F.countDistinct("h"))
                / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("dup_bp"),
        )
        .orderBy("source")
    )


# --- q423/q424: round-8 wave 2 — split leakage + C4 line dedup ---------------

_KNUTH_A = 2654435761
_KNUTH_M = 4294967296
_KNUTH_T = 3435973837  # floor(0.8 * 2^32) — the q69 80/20 threshold

_DUCK_LEAKAGE = f"""
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
      FROM shared JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
      WHERE round(shared / (sa.sz + sb.sz - shared), 4) >= 0.5),
         edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
         reach(a, b) AS (
      SELECT src, src FROM edges
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
         cc AS (SELECT a AS doc_id, min(b) AS cl FROM reach GROUP BY a),
         excl AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS xcl FROM documents),
         asg AS (
      SELECT e.doc_id,
             CASE WHEN (e.doc_id * {_KNUTH_A}) % {_KNUTH_M} < {_KNUTH_T}
                  THEN 1 ELSE 0 END AS nv,
             CASE WHEN (e.xcl * {_KNUTH_A}) % {_KNUTH_M} < {_KNUTH_T}
                  THEN 1 ELSE 0 END AS xv,
             CASE WHEN (coalesce(c.cl, e.doc_id) * {_KNUTH_A}) % {_KNUTH_M} < {_KNUTH_T}
                  THEN 1 ELSE 0 END AS cv
      FROM excl e LEFT JOIN cc c ON e.doc_id = c.doc_id),
         j AS (
      SELECT a.nv AS nv_a, a.xv AS xv_a, a.cv AS cv_a,
             b.nv AS nv_b, b.xv AS xv_b, b.cv AS cv_b
      FROM pairs p JOIN asg a ON p.id_a = a.doc_id JOIN asg b ON p.id_b = b.doc_id)
    SELECT policy, n_pairs, leaked_pairs,
           CASE WHEN n_pairs = 0 THEN NULL
                ELSE CAST(round(10000.0 * leaked_pairs / n_pairs) AS BIGINT)
           END AS leak_bp
    FROM (
      SELECT 'a_naive_hash' AS policy, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(coalesce(sum(CASE WHEN nv_a <> nv_b THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS leaked_pairs FROM j
      UNION ALL
      SELECT 'b_exact_cluster', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(CASE WHEN xv_a <> xv_b THEN 1 ELSE 0 END), 0)
               AS BIGINT) FROM j
      UNION ALL
      SELECT 'c_neardup_cluster', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(CASE WHEN cv_a <> cv_b THEN 1 ELSE 0 END), 0)
               AS BIGINT) FROM j)
    ORDER BY policy
"""


@register("q423_split_leakage_audit", _DUCK_LEAKAGE)
def q423_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split leakage audit (Lee et al. ACL 2022,
    "Deduplicating Training Data Makes Language Models Better", §6:
    near-duplicates straddling the split let models memorize "unseen"
    eval text): take the q27 near-dup pair table (3-shingle Jaccard
    >= 0.5) and measure, for three split policies, how many near-dup
    pairs end up with one member in train and one in test under the
    q69 Knuth 80/20 hash split. Policies: (a) naive per-doc hash, (b)
    hash of the EXACT-dup cluster id (min doc_id per identical text —
    what a pipeline that only exact-dedups gets), (c) hash of the
    NEAR-dup connected-component id — the correct fix; its leak count
    is 0 by construction because every pair is intra-component. On
    this corpus (a) and (b) leak the same 40% of pairs: exact
    clustering alone fixes NOTHING for near-dup leakage, which is the
    published finding.

    Exactness: pair generation is the q27 integer pipeline; split
    assignment is pure BIGINT Knuth arithmetic (q69); component ids
    are exact min-label fixpoints (Spark: pointer-jumping min-label
    propagation; oracle: recursive-CTE reachability + min). All
    outputs are integer counts; leak_bp is one rounded division.

    100 TB shape: pair table via the inverted shingle index (never
    doc x doc); the component step is the q29-style O(log diameter)
    pointer-jumping loop over an edge list that is PAIR-sized, not
    corpus-sized; assignments attach by two keyed equi-joins on doc
    id. The pair table is checkpointed because it feeds both the
    component loop and the final audit join. The audit itself is one
    explode(array(policy-structs)) + one 3-group aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return _leakage_audit(spark, docs)


def _leakage_audit(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Shared core of q423/q423b: the three-policy leakage census over
    whatever corpus frame the caller supplies (raw for q423, the
    exact-deduped funnel input for q423b)."""
    from pyspark.sql import Window

    from ooh_etl_spark.operators.graph import connected_components

    pairs = (
        jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    cc = connected_components(pairs)
    xcl = F.min("doc_id").over(Window.partitionBy("text"))

    def _knuth(col):
        return ((col * F.lit(_KNUTH_A)) % F.lit(_KNUTH_M) < F.lit(_KNUTH_T)).cast(
            "int"
        )

    asg = (
        docs.select("doc_id", xcl.alias("xcl"))
        .join(cc, F.col("doc_id") == F.col("id"), "left")
        .select(
            "doc_id",
            _knuth(F.col("doc_id")).alias("nv"),
            _knuth(F.col("xcl")).alias("xv"),
            _knuth(F.coalesce(F.col("cluster"), F.col("doc_id"))).alias("cv"),
        )
        # asg feeds BOTH pair sides (a and b): without a checkpoint
        # Spark re-runs the corpus-wide text window + cc join once per
        # side (non-cached subtrees are re-executed per consumer — the
        # round-6 union-recompute audit class). The checkpointed frame
        # is narrow: doc_id + three ints.
        .localCheckpoint()
    )
    a = asg.select(
        F.col("doc_id").alias("id_a"),
        F.col("nv").alias("nv_a"),
        F.col("xv").alias("xv_a"),
        F.col("cv").alias("cv_a"),
    )
    b = asg.select(
        F.col("doc_id").alias("id_b"),
        F.col("nv").alias("nv_b"),
        F.col("xv").alias("xv_b"),
        F.col("cv").alias("cv_b"),
    )
    j = pairs.join(a, "id_a").join(b, "id_b")
    tall = j.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("a_naive_hash").alias("policy"),
                    (F.col("nv_a") != F.col("nv_b")).cast("int").alias("leak"),
                ),
                F.struct(
                    F.lit("b_exact_cluster").alias("policy"),
                    (F.col("xv_a") != F.col("xv_b")).cast("int").alias("leak"),
                ),
                F.struct(
                    F.lit("c_neardup_cluster").alias("policy"),
                    (F.col("cv_a") != F.col("cv_b")).cast("int").alias("leak"),
                ),
            )
        ).alias("x")
    ).select("x.*")
    agg = tall.groupBy("policy").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("leak").cast("bigint").alias("leaked_pairs"),
        F.round(10000.0 * F.sum("leak") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("leak_bp"),
    )
    # Pair-free guard (ADVICE r8): on a corpus with zero near-dup
    # pairs the aggregate above is empty while the oracle still emits
    # its three policy rows — left-join a literal policy frame so both
    # sides agree (zero counts, NULL leak_bp).
    policies = spark.createDataFrame(
        [("a_naive_hash",), ("b_exact_cluster",), ("c_neardup_cluster",)],
        "policy string",
    )
    return (
        policies.join(F.broadcast(agg), "policy", "left")
        .select(
            "policy",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("leaked_pairs", F.lit(0)).cast("bigint").alias("leaked_pairs"),
            F.col("leak_bp"),
        )
        .orderBy("policy")
    )


# q423b funnel-input variant (VERDICT r8 item 4): the same audit run
# behind the q162 funnel's exact-dedup-first stage. The oracle is the
# q423 SQL with every corpus reference swapped for the digest-deduped
# view — textually derived so the two can never drift.
_DUCK_DD_DOCS = (
    "(SELECT * FROM documents WHERE doc_id IN "
    "(SELECT min(doc_id) FROM documents GROUP BY text))"
)
_DUCK_LEAKAGE_FUNNEL = _DUCK_LEAKAGE.replace("FROM documents", f"FROM {_DUCK_DD_DOCS}")


@register("q423b_split_leakage_audit_funnel", _DUCK_LEAKAGE_FUNNEL)
def q423b_split_leakage_audit_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q423 behind the q162 funnel ordering: exact-dedup FIRST (q26
    min-id-per-text), then the near-dup split-leakage audit on the
    deduped corpus. This is the canonical entry to run at scale —
    three independent measurements (q27 r7, q379/q423 r8, SCALE.md)
    showed that duplicate-inflated posting lists and clique-inflated
    pair components are what break the raw form on replicated input,
    and the exact-dedup stage is precisely what removes them. Post-
    dedup, every text is unique, so policy b (exact-cluster hash)
    coincides with policy a (naive hash) by construction — the audit
    then isolates the residual NEAR-dup leakage that only policy c
    fixes, which is the decision a pipeline operator actually faces
    after exact dedup has already run.

    100 TB shape: one text-keyed exchange for the dedup window (the
    q26 cost), then the q423 pair-sized pipeline on the SHRUNKEN
    corpus; the funnel guarantees posting lists at their natural
    lengths regardless of upstream replication."""
    docs = exact_dedup(
        load_table(spark, sf_dir, "documents"), key="text", id_col="doc_id"
    )
    return _leakage_audit(spark, docs)


_LINE_W = 8  # tokens per synthesized "line" (the corpus has no newlines)

_DUCK_LINE_DEDUP = f"""
    WITH d AS (
      SELECT doc_id, source, {_DUCK_TOKS} AS toks,
             CAST(ceil(len({_DUCK_TOKS}) / {_LINE_W}.0) AS BIGINT) AS nch
      FROM documents),
         ln AS (
      SELECT doc_id, source,
             unnest(generate_series(1, nch)) AS line_idx,
             unnest(list_transform(generate_series(1, nch),
                    i -> array_to_string(toks[(i-1)*{_LINE_W}+1:i*{_LINE_W}], ' ')))
               AS line
      FROM d),
         r AS (
      SELECT source, length(line) AS lc,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) AS rn
      FROM ln)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(round(10000.0 * sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) / count(*))
             AS BIGINT) AS retained_lines_bp,
           CAST(sum(lc) AS BIGINT) AS n_chars,
           CAST(sum(CASE WHEN rn = 1 THEN lc ELSE 0 END) AS BIGINT) AS n_chars_kept,
           CAST(round(10000.0 * sum(CASE WHEN rn = 1 THEN lc ELSE 0 END) / sum(lc))
             AS BIGINT) AS retained_chars_bp
    FROM r GROUP BY source ORDER BY source
"""


@register("q424_line_dedup", _DUCK_LINE_DEDUP)
def q424_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document line-level dedup census (Raffel et al.
    JMLR 2020, §2.2: C4 removes any three-sentence span occurring more
    than once in Common Crawl; CCNet and RefinedWeb dedup at the line
    level): synthesize deterministic {_LINE_W}-token "lines" (the
    fixture corpus has no newlines), keep only the globally FIRST
    occurrence of each distinct line (ordered by doc_id, then position
    within the doc), and report the per-source retention census in
    lines and in characters — the boilerplate-removal yield a crawl
    pipeline watches per ingest source.

    Exactness: lines are exact strings from the shared whitespace
    tokenizer; first-occurrence is a deterministic total order
    (doc_id, line_idx); all outputs are integer counts plus two
    rounded basis-point divisions over integer sums.

    100 TB shape: ONE explode (doc -> lines, linear in corpus
    tokens), ONE line-keyed exchange for the first-occurrence window
    (hash-partitioned on the line text — the dedup shuffle every
    line/span dedup pays, cf. q163's span removal), then one
    source-group aggregate. No joins, no second corpus scan — the
    kept flag rides the window output. A corpus-universal line would
    hot-key its window partition; the q422 skew note applies (AQE
    skew handling or an aggregate+join-back rewrite are
    oracle-identical fallbacks)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
    )
    t1 = d.select(
        "doc_id",
        "source",
        "toks",
        F.explode(
            F.sequence(
                F.lit(1),
                F.ceil(F.size("toks") / float(_LINE_W)).cast("int"),
            )
        ).alias("line_idx"),
    )
    ln = t1.select(
        "doc_id",
        "source",
        "line_idx",
        F.expr(
            f"array_join(slice(toks, (line_idx - 1) * {_LINE_W} + 1, {_LINE_W}), ' ')"
        ).alias("line"),
    )
    r = ln.select(
        "source",
        F.length("line").alias("lc"),
        F.row_number()
        .over(Window.partitionBy("line").orderBy("doc_id", "line_idx"))
        .alias("rn"),
    )
    kept = (F.col("rn") == 1).cast("int")
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.round(10000.0 * F.sum(kept) / F.count(F.lit(1)))
            .cast("bigint")
            .alias("retained_lines_bp"),
            F.sum("lc").cast("bigint").alias("n_chars"),
            F.sum(kept * F.col("lc")).cast("bigint").alias("n_chars_kept"),
            F.round(10000.0 * F.sum(kept * F.col("lc")) / F.sum("lc"))
            .cast("bigint")
            .alias("retained_chars_bp"),
        )
        .orderBy("source")
    )


# --- round-9 wave: q425 BOW dedup, q426 cluster reps, q427 MinHash calib ----

_DUCK_BOW_DEDUP = f"""
    WITH d AS (
      SELECT doc_id, source, text, {_DUCK_TOKS} AS toks FROM documents),
         f AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY text ORDER BY doc_id)
               AS rn_exact,
             row_number() OVER (
               PARTITION BY md5(array_to_string(list_sort(toks), ' '))
               ORDER BY doc_id) AS rn_bow
      FROM d)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn_exact = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_kept,
           CAST(sum(CASE WHEN rn_bow = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bow_kept,
           CAST(sum(CASE WHEN rn_exact = 1 AND rn_bow > 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS reorder_only_dups,
           CAST(round(10000.0 * sum(CASE WHEN rn_bow > 1 THEN 1 ELSE 0 END)
                      / count(*)) AS BIGINT) AS bow_dup_bp
    FROM f GROUP BY source ORDER BY source
"""


@register("q425_bow_fingerprint_dedup", _DUCK_BOW_DEDUP)
def q425_bow_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words fingerprint dedup census: fingerprint = md5 of the
    SORTED token multiset, so two documents that contain the same
    words in a different order (template re-renders, shuffled list
    pages, SEO spam permutations) collide even though byte-exact
    (q26) and whitespace-normalized (q327) dedup both miss them.
    Reports, per source, the exact-kept and BOW-kept counts plus the
    interesting difference: ``reorder_only_dups`` — documents exact
    dedup keeps that BOW dedup drops. First-occurrence keep rule
    (min doc_id per fingerprint) matches q26/q424.

    Exactness: md5 over the identically-tokenized sorted join on both
    engines; all outputs are integer counts and one rounded bp ratio.

    100 TB shape: the fingerprint is scan-stage codegen (sort of a
    ~100-token in-row array is O(L log L) per doc, no explode); the
    census is two fingerprint-keyed window exchanges + one source
    aggregate — the q424 line-dedup discipline one level up
    (doc-granular instead of line-granular), and the cheapest
    near-dup-class signal the funnel can run before any shingle
    explode."""
    from pyspark.sql import Window

    from ooh_etl_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    base = docs.select(
        "doc_id",
        "source",
        "text",
        F.md5(F.array_join(F.array_sort(toks), " ")).alias("bow_fp"),
    )
    rn_exact = F.row_number().over(
        Window.partitionBy("text").orderBy("doc_id")
    )
    rn_bow = F.row_number().over(
        Window.partitionBy("bow_fp").orderBy("doc_id")
    )
    flagged = base.select(
        "source", rn_exact.alias("rn_exact"), rn_bow.alias("rn_bow")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("rn_exact") == 1).cast("int"))
            .cast("bigint")
            .alias("n_exact_kept"),
            F.sum((F.col("rn_bow") == 1).cast("int"))
            .cast("bigint")
            .alias("n_bow_kept"),
            F.sum(
                ((F.col("rn_exact") == 1) & (F.col("rn_bow") > 1)).cast("int")
            )
            .cast("bigint")
            .alias("reorder_only_dups"),
            F.round(
                10000.0
                * F.sum((F.col("rn_bow") > 1).cast("int"))
                / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("bow_dup_bp"),
        )
        .orderBy("source")
    )


_DUCK_CLUSTER_REPS = f"""
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
      FROM shared JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
      WHERE round(shared / (sa.sz + sb.sz - shared), 4) >= 0.5),
         edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
         reach(a, b) AS (
      SELECT src, src FROM edges
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
         cc AS (SELECT a AS doc_id, min(b) AS cl FROM reach GROUP BY a),
         m AS (
      SELECT c.cl, doc.doc_id, doc.source, doc.n_chars,
             row_number() OVER (PARTITION BY c.cl
                                ORDER BY doc.n_chars DESC, doc.doc_id)
               AS rn
      FROM cc c JOIN documents doc ON c.doc_id = doc.doc_id)
    SELECT CAST(cl AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_doc_id,
           CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
             AS rep_n_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM m GROUP BY cl
    ORDER BY n_members DESC, cluster_id LIMIT 20
"""


@register("q426_cluster_representatives", _DUCK_CLUSTER_REPS)
def q426_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster canonicalization: after pair generation (q27
    inverted index) and connected components (q29-style min-label),
    pick the document every cluster KEEPS — not the arbitrary min-id
    the plain dedup census uses, but the highest-quality member
    (longest text, ties to the smallest doc_id), which is how
    production pipelines canonicalize crawl clusters (keep the
    longest/cleanest variant, drop truncated mirrors). Emits the 20
    largest clusters with their representative and source spread.

    Exactness: the representative is a (n_chars DESC, doc_id ASC)
    struct extremum — the q55 lesson: never argmax over non-unique
    values without a total tie-break — so both engines pick the same
    member at any data.

    100 TB shape: pair table via the inverted index (never doc x doc),
    CC via the pair-sized pointer-jumping loop, membership attach by
    one keyed equi-join, representative by a max(struct) aggregate on
    the cluster key — no window over the corpus, no driver loop. The
    top-20 is a sort of the CLUSTER-count-sized aggregate, not the
    corpus."""
    from ooh_etl_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    cc = connected_components(pairs)
    members = cc.join(
        docs.select("doc_id", "source", "n_chars"),
        cc["id"] == docs["doc_id"],
    )
    rep = F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nid")))
    return (
        members.groupBy(F.col("cluster").cast("bigint").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            (-rep.getField("nid")).cast("bigint").alias("rep_doc_id"),
            rep.getField("n_chars").cast("bigint").alias("rep_n_chars"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .orderBy(F.desc("n_members"), "cluster_id")
        .limit(20)
    )


# MinHash calibration constants: K independent universal-hash
# permutations h_k(x) = (a_k * x + b_k) mod P over md5-derived 32-bit
# shingle keys, P = 2^31 - 1 (Mersenne). a_k/b_k are fixed Knuth-/
# Weyl-derived odd constants so both engines evaluate the identical
# integer arithmetic.
_MH_P = 2147483647
_MH_K = 16
_MH_A = [(2654435761 * (k + 1)) % _MH_P or 1 for k in range(_MH_K)]
_MH_B = [(40503 * (k + 1) + 7) % _MH_P for k in range(_MH_K)]

_DUCK_MH_SIGS = ",\n             ".join(
    f"min(({_MH_A[k]} * h + {_MH_B[k]}) % {_MH_P}) AS s{k}"
    for k in range(_MH_K)
)
_DUCK_MH_MATCHES = " + ".join(
    f"CASE WHEN a.s{k} = b.s{k} THEN 1 ELSE 0 END" for k in range(_MH_K)
)

_DUCK_MINHASH_CALIB = f"""
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
         inv AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT)
               % {_MH_P} AS h
      FROM (SELECT doc_id, unnest(sh) AS shingle FROM s)),
         sig AS (
      SELECT doc_id,
             {_DUCK_MH_SIGS}
      FROM inv GROUP BY doc_id),
         shared AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS shared
      FROM (SELECT doc_id, unnest(sh) AS shingle FROM s) x
      JOIN (SELECT doc_id, unnest(sh) AS shingle FROM s) y
        ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2),
         pairs AS (
      SELECT id_a, id_b,
             CAST(round(round(shared / (sa.sz + sb.sz - shared), 4) * 10000)
               AS BIGINT) AS j10k
      FROM shared JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
      WHERE round(shared / (sa.sz + sb.sz - shared), 4) >= 0.2),
         e AS (
      SELECT p.j10k, ({_DUCK_MH_MATCHES}) AS matches
      FROM pairs p JOIN sig a ON p.id_a = a.doc_id
                   JOIN sig b ON p.id_b = b.doc_id)
    SELECT CAST(least(j10k // 2000, 4) * 2000 AS BIGINT) AS bucket_lo_bp,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(round(1.0 * sum(j10k) / count(*)) AS BIGINT) AS mean_true_bp,
           CAST(round(1.0 * sum(matches * 625) / count(*)) AS BIGINT)
             AS mean_est_bp,
           CAST(round(1.0 * sum(abs(matches * 625 - j10k)) / count(*))
             AS BIGINT) AS mae_bp,
           CAST(round(1.0 * sum(matches * 625 - j10k) / count(*)) AS BIGINT)
             AS bias_bp
    FROM e GROUP BY 1 ORDER BY 1
"""


@register("q427_minhash_calibration", _DUCK_MINHASH_CALIB)
def q427_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration (Broder 1997, "On the resemblance
    and containment of documents"): for every candidate pair with true
    3-shingle Jaccard >= 0.2, compare the exact Jaccard against the
    K=16-permutation MinHash signature-agreement estimate
    (matches/K), reporting per-Jaccard-band pair counts, means, MAE
    and signed bias in basis points — the measurement that tells an
    operator whether the deployed K is tight enough before trusting
    LSH band thresholds (q28/q29) at scale.

    Exactness: the whole comparison is integer arithmetic — shingle
    keys are md5-derived 32-bit ints, permutations are (a*x+b) mod
    2^31-1 with shared literal constants, the estimate lands on the
    625-bp grid (matches * 10000/16 exactly) — so both engines agree
    bit-for-bit; the only doubles are final fixed-denominator means,
    rounded to integer bp.

    100 TB shape: signatures are ONE groupBy(doc) over the shingle
    explode (K mins ride one aggregation tree — map-side combinable,
    K*8 bytes of state per doc); candidate pairs come from the q27
    inverted index, and the calibration join attaches two K-int
    signature rows per PAIR — pair-sized, never corpus-quadratic. At
    scale you run it on a deterministic doc-hash sample; the estimator
    statistics are sample-invariant."""
    from ooh_etl_spark.functions.text import tokenize, word_shingles_from_tokens

    docs = load_table(spark, sf_dir, "documents")

    sh = docs.select(
        "doc_id", tokenize(F.col("text")).alias("toks")
    ).select(
        "doc_id", word_shingles_from_tokens(F.col("toks"), 3).alias("sh")
    )
    inv = sh.select(
        "doc_id", F.explode_outer("sh").alias("shingle")
    ).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
            % _MH_P
        ).alias("h"),
    )
    sig = inv.groupBy("doc_id").agg(
        *[
            F.min((F.lit(_MH_A[k]) * F.col("h") + F.lit(_MH_B[k])) % _MH_P)
            .alias(f"s{k}")
            for k in range(_MH_K)
        ]
    )
    pairs = jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.2).select(
        "id_a",
        "id_b",
        F.round(F.col("jaccard") * 10000).cast("bigint").alias("j10k"),
    )
    a = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"s{k}").alias(f"a{k}") for k in range(_MH_K)],
    )
    b = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"s{k}").alias(f"b{k}") for k in range(_MH_K)],
    )
    matches = sum(
        (F.col(f"a{k}") == F.col(f"b{k}")).cast("int") for k in range(_MH_K)
    )
    e = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("j10k", matches.alias("matches"))
    )
    err = F.col("matches") * 625 - F.col("j10k")
    return (
        e.groupBy(
            (F.least(F.floor(F.col("j10k") / 2000), F.lit(4)) * 2000)
            .cast("bigint")
            .alias("bucket_lo_bp")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.sum("j10k") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_true_bp"),
            F.round(F.sum(F.col("matches") * 625) / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_est_bp"),
            F.round(F.sum(F.abs(err)) / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mae_bp"),
            F.round(F.sum(err) / F.count(F.lit(1)))
            .cast("bigint")
            .alias("bias_bp"),
        )
        .orderBy("bucket_lo_bp")
    )


# --- round-9 wave (cont.): q428 ROUGE-2 overlap on near-dup pairs ----------

_DUCK_ROUGE2 = f"""
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
      GROUP BY 1, 2),
         cand AS (
      SELECT id_a, id_b
      FROM shared JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
      WHERE round(shared / (sa.sz + sb.sz - shared), 4) >= 0.5),
         g AS (
      SELECT doc_id, gram, count(*) AS cnt
      FROM (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(toks) - 1),
                                         i -> array_to_string(toks[i:i+1], ' ')))
                     AS gram
            FROM d)
      GROUP BY doc_id, gram),
         tot AS (
      SELECT doc_id, len(toks) - 1 AS tot FROM d WHERE len(toks) >= 2),
         -- per-doc gram-count LISTS: the clipped intersection is then
         -- an in-row lambda over the two pair-side lists. A relational
         -- (cand JOIN g JOIN g ON gram) form is semantically identical
         -- but exposes the optimizer to a gram-first join order that
         -- recreates the all-pairs posting blowup (measured: >5 min on
         -- the 5x replica vs seconds for this form).
         gl AS (
      SELECT doc_id, list(struct_pack(gram := gram, cnt := cnt)) AS gl
      FROM g GROUP BY doc_id),
         ovl AS (
      SELECT c.id_a, c.id_b,
             list_sum(list_transform(ga.gl, x ->
               coalesce(list_sum(list_transform(
                          list_filter(gb.gl, y -> y.gram = x.gram),
                          y -> least(x.cnt, y.cnt))), 0))) AS ovl
      FROM cand c JOIN gl ga ON ga.doc_id = c.id_a
                  JOIN gl gb ON gb.doc_id = c.id_b)
    SELECT o.id_a, o.id_b,
           CAST(o.ovl AS BIGINT) AS ovl,
           CAST(ta.tot AS BIGINT) AS tot_a,
           CAST(tb.tot AS BIGINT) AS tot_b,
           CAST((10000 * o.ovl) // ta.tot AS BIGINT) AS rouge2_recall_bp,
           CAST((10000 * o.ovl) // tb.tot AS BIGINT) AS rouge2_precision_bp,
           CAST((20000 * o.ovl) // (ta.tot + tb.tot) AS BIGINT) AS rouge2_f1_bp
    FROM ovl o JOIN tot ta ON o.id_a = ta.doc_id JOIN tot tb ON o.id_b = tb.doc_id
    ORDER BY rouge2_f1_bp DESC, o.id_a, o.id_b LIMIT 20
"""


@register("q428_rouge2_pair_overlap", _DUCK_ROUGE2)
def q428_rouge2_pair_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 (Lin, ACL-WS 2004) RE-RANK of the near-dup candidate
    funnel: for each q27 Jaccard candidate pair, the CLIPPED
    bigram-multiset overlap ``sum(min(cnt_a, cnt_b))`` — unlike
    Jaccard over shingle SETS, repeated bigrams count up to their
    occurrence in the other document, the n-gram-recall measure
    summarization eval and near-dup triage both use. With reference =
    lower doc_id: recall = ovl/tot_a, precision = ovl/tot_b, and F1
    collapses to the closed form 2*ovl/(tot_a+tot_b). Top-20 by F1
    under a full deterministic tie-order.

    Exactness: all outputs are integers; every ratio is an INTEGER
    floor division (``(10000*ovl) // tot``), so the two engines cannot
    diverge on rounding edges. The LIMIT is safe because the ORDER BY
    is a total order (f1, id_a, id_b).

    100 TB shape — candidates-then-rerank, NOT all-pairs: bigram
    posting lists are Zipf-hot (sf0.1: 931 distinct bigrams, hottest
    df 338, so ALL co-occurring pairs = 36.5M pair-gram rows / 10.3M
    distinct pairs to emit 20 — measured 31s, the same sf-bounded
    wall q334/q379 document). Instead the pair set comes from the q27
    shingle funnel (pair-sized by construction, run behind the q162
    exact-dedup-first ordering) and the clipped counts attach by TWO
    keyed equi-joins (id_a, then id_b+gram), so the rerank cost is
    candidates x doc-length, linear in the funnel output. This is the
    standing LSH-candidates -> exact-verify discipline (q31/q53)
    applied to an overlap SCORE instead of a boolean."""
    from ooh_etl_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    cand = jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5).select(
        "id_a", "id_b"
    )
    base = (
        docs.select(
            F.col("doc_id").alias("id"),
            tokenize(F.col("text")).alias("toks"),
        )
        .select(
            "id",
            (F.size("toks") - 1).cast("bigint").alias("tot"),
            F.explode_outer(
                # Guarded like text_stats' bigram census: size=1 would
                # make sequence(1, 0) DESCEND to [1, 0] and toks[1]
                # raise under Spark 4 ANSI mode (DuckDB's
                # generate_series(1, 0) is empty, so the oracle is
                # already safe on 1-token docs).
                F.expr(
                    "CASE WHEN size(toks) >= 2 THEN"
                    " transform(sequence(1, size(toks) - 1),"
                    " i -> concat(toks[i-1], ' ', toks[i]))"
                    " ELSE array() END"
                )
            ).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
    )
    g = base.groupBy("id", "tot", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    a = g.select(
        F.col("id").alias("id_a"),
        F.col("tot").alias("tot_a"),
        "gram",
        F.col("cnt").alias("cnt_a"),
    )
    b = g.select(
        F.col("id").alias("id_b"),
        F.col("tot").alias("tot_b"),
        "gram",
        F.col("cnt").alias("cnt_b"),
    )
    scored = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "gram"])
        .groupBy("id_a", "id_b", "tot_a", "tot_b")
        .agg(F.sum(F.least("cnt_a", "cnt_b")).cast("bigint").alias("ovl"))
        .select(
            "id_a",
            "id_b",
            "ovl",
            F.col("tot_a").cast("bigint").alias("tot_a"),
            F.col("tot_b").cast("bigint").alias("tot_b"),
            F.expr("(10000 * ovl) div tot_a").alias("rouge2_recall_bp"),
            F.expr("(10000 * ovl) div tot_b").alias("rouge2_precision_bp"),
            F.expr("(20000 * ovl) div (tot_a + tot_b)").alias("rouge2_f1_bp"),
        )
    )
    return scored.orderBy(
        F.desc("rouge2_f1_bp"), "id_a", "id_b"
    ).limit(20)


# --- round-9 wave (cont.): q431 shingle containment --------------------------

_DUCK_CONTAINMENT = f"""
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
           CAST(shared AS BIGINT) AS shared,
           CAST(sa.sz AS BIGINT) AS sz_a,
           CAST(sb.sz AS BIGINT) AS sz_b,
           CAST(CASE WHEN sa.sz < sb.sz OR (sa.sz = sb.sz) THEN id_a
                     ELSE id_b END AS BIGINT) AS contained_id,
           CAST((10000 * shared) // least(sa.sz, sb.sz) AS BIGINT)
             AS containment_bp,
           CAST((10000 * shared) // (sa.sz + sb.sz - shared) AS BIGINT)
             AS jaccard_bp
    FROM shared JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
    WHERE (10000 * shared) // least(sa.sz, sb.sz) >= 7000
    ORDER BY containment_bp DESC, id_a, id_b
"""


@register("q431_shingle_containment", _DUCK_CONTAINMENT)
def q431_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT (Broder, SEQUENCES'97 distinguishes
    resemblance from containment): ``shared / min(|A|, |B|)`` — the
    asymmetric near-dup measure that catches quote inclusion and
    wrapper/boilerplate pages, where a short document's shingles sit
    almost wholly inside a long one while Jaccard stays far below any
    dedup threshold (the union is dominated by the long side). Emits
    pairs at containment >= 0.70 with the contained side identified
    (the smaller shingle set; ties to id_a) and the Jaccard alongside
    for contrast.

    Exactness: same 3-shingle SET construction as q27 (one shared
    definition in both engines); all ratios are INTEGER floor
    divisions — no rounding edge.

    100 TB shape: identical posting-list pipeline to q27/q428 (gram
    self-join, never doc x doc; run behind the q162 exact-dedup-first
    funnel). Containment needs no extra pass: it reads off the same
    shared-count aggregate with a different denominator."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=None, raw_counts=True
    )
    c = (
        pairs.select(
            "id_a",
            "id_b",
            F.col("shared").cast("bigint").alias("shared"),
            F.col("sz_a").cast("bigint").alias("sz_a"),
            F.col("sz_b").cast("bigint").alias("sz_b"),
        )
        .select(
            "*",
            F.when(F.col("sz_a") <= F.col("sz_b"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .cast("bigint")
            .alias("contained_id"),
            F.expr("(10000 * shared) div least(sz_a, sz_b)").alias(
                "containment_bp"
            ),
            F.expr("(10000 * shared) div (sz_a + sz_b - shared)").alias(
                "jaccard_bp"
            ),
        )
        .filter(F.col("containment_bp") >= 7000)
    )
    return c.orderBy(F.desc("containment_bp"), "id_a", "id_b")


# --- round-11 wave: q442 soft deduplication (reweight, don't remove) --------

_SD_N = 2  # bigram commonness: the shortest gram with cross-doc signal


_DUCK_SOFTDEDUP = f"""
    WITH t AS (
      SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents),
         g AS (
      SELECT doc_id, source,
             unnest(list_transform(
               generate_series(1, len(toks) - {_SD_N - 1}),
               i -> array_to_string(toks[i:i+{_SD_N - 1}], ' '))) AS gram
      FROM t WHERE len(toks) >= {_SD_N}),
         freq AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
         per_doc AS (
      SELECT g.doc_id, g.source,
             count(*) AS n_g,
             sum(f.c) AS sum_c
      FROM g JOIN freq f USING (gram)
      GROUP BY g.doc_id, g.source),
         w AS (
      SELECT doc_id, source, n_g,
             (1000 * n_g) // sum_c AS w_milli
      FROM per_doc)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_g) AS BIGINT) AS n_grams,
           CAST(sum(n_g * w_milli) AS BIGINT) AS eff_grams_milli,
           CAST(10000 - (10000 * sum(n_g * w_milli)) // (1000 * sum(n_g))
                AS BIGINT) AS downweight_bp
    FROM w GROUP BY source ORDER BY source
"""


@register("q442_softdedup_weights", _DUCK_SOFTDEDUP)
def q442_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication by commonness reweighting (He et al. 2024,
    'SoftDedup: an Efficient Data Reweighting Method for Speeding Up
    Language Model Pretraining', arXiv:2407.06654 — instead of
    REMOVING near-duplicates, keep every doc but downweight its
    sampling probability by how common its n-grams are): per doc the
    inverse mean corpus frequency of its bigrams, w = n_grams /
    sum(freq), in exact milli units (w = 1000 exactly when every gram
    is unique; duplicated boilerplate drives w toward 0), then a
    per-source census of effective (weighted) gram mass and the
    implied downweight in basis points. The census is the
    sampling-temperature input a soft-dedup training mix needs, and
    the per-source downweight ranks sources by internal redundancy —
    the same signal q26/q151 act on destructively, preserved here as
    a weight.

    Exactness: gram frequencies are integers; per-doc weights are
    truncating integer divisions at milli scale; source rollups are
    integer sums with one final basis-point division (div-// pair).

    100 TB shape: the gram frequency table is one map-side-combinable
    aggregate; the join back is keyed by gram — the q152 inverted-
    index shape, shuffling (gram, count) pairs only — and the census
    is a |sources|-key rollup. Nothing quadratic: redundancy is
    measured per GRAM, never per document pair."""
    from ooh_etl_spark.tables import parallelize_rows

    docs = parallelize_rows(load_table(spark, sf_dir, "documents"))
    from ooh_etl_spark.functions.text import tokenize

    t = docs.select("doc_id", "source", tokenize(F.col("text")).alias("toks"))
    idx = F.when(
        F.size("toks") >= _SD_N,
        F.sequence(F.lit(1), F.size("toks") - (_SD_N - 1)),
    ).otherwise(F.array().cast("array<int>"))
    g = t.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.col("toks")[i - 1], F.col("toks")[i]
                ),
            )
        ).alias("gram"),
    ).localCheckpoint()  # gram stream feeds the freq table AND the join back
    freq = g.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (
        g.join(freq, "gram")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_g"), F.sum("c").alias("sum_c"))
    )
    w = per_doc.select(
        "source",
        "n_g",
        F.expr("(1000 * n_g) div sum_c").alias("w_milli"),
    )
    return (
        w.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_g").cast("bigint").alias("n_grams"),
            F.sum(F.col("n_g") * F.col("w_milli"))
            .cast("bigint")
            .alias("eff_grams_milli"),
            F.expr(
                "CAST(10000 - (10000 * sum(n_g * w_milli))"
                " div (1000 * sum(n_g)) AS BIGINT)"
            ).alias("downweight_bp"),
        )
        .orderBy("source")
    )


# --- round-11 wave 2: q450 normalization-dedup yield ladder -------------------

_DUCK_NORM_LADDER = """
    WITH n AS (
      SELECT doc_id,
             text AS raw,
             lower(trim(text)) AS lo,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS ws,
             regexp_replace(regexp_replace(lower(trim(text)),
                            '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g') AS al
      FROM documents),
         u AS (
      SELECT 0 AS rung, 'raw' AS policy, count(*) AS n_docs,
             count(DISTINCT raw) AS n_distinct FROM n
      UNION ALL
      SELECT 1, 'lower_trim', count(*), count(DISTINCT lo) FROM n
      UNION ALL
      SELECT 2, 'ws_collapse', count(*), count(DISTINCT ws) FROM n
      UNION ALL
      SELECT 3, 'alnum_only', count(*), count(DISTINCT al) FROM n)
    SELECT CAST(rung AS BIGINT) AS rung, policy,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(n_docs - n_distinct AS BIGINT) AS n_removed,
           CAST((10000 * (n_docs - n_distinct)) // n_docs AS BIGINT)
             AS removed_bp
    FROM u ORDER BY rung
"""


@register("q450_norm_dedup_ladder", _DUCK_NORM_LADDER)
def q450_norm_dedup_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-dedup yield ladder — the ablation behind choosing
    an exact-dedup KEY (CCNet dedups lowercased-digit-stripped
    paragraphs; C4 dedups raw lines; Dolma documents the choice
    explicitly): exact-duplicate yield under four successively
    coarser normalizations (raw, lower+trim, whitespace-collapse,
    alphanumeric-only). Yield is monotone non-decreasing down the
    ladder BY CONSTRUCTION (each rung's key is a function of the
    previous rung's); the interesting number is the GAP between rungs
    — how many dups only a coarser key catches — which prices what
    q327's digest normalization buys before committing a 100 TB pass
    to it.

    100 TB shape: the four keys are scan-stage string expressions; in
    production each count(DISTINCT key) is one hash aggregate — here
    they union into one pass of four aggregates over the same scan
    (Spark reuses the underlying exchange); nothing beyond
    (key)-keyed shuffles of digests."""
    docs = load_table(spark, sf_dir, "documents")
    lo = F.lower(F.trim(F.col("text")))
    ws = F.regexp_replace(lo, r"\s+", " ")
    al = F.regexp_replace(
        F.regexp_replace(lo, "[^a-z0-9 ]", ""), r"\s+", " "
    )
    n = docs.select(
        F.col("text").alias("raw"),
        lo.alias("lo"),
        ws.alias("ws"),
        al.alias("al"),
    ).localCheckpoint()  # four rungs read the same normalized frame

    def rung(i, name, col):
        return n.agg(
            F.lit(i).cast("bigint").alias("rung"),
            F.lit(name).alias("policy"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
        )

    u = (
        rung(0, "raw", "raw")
        .unionAll(rung(1, "lower_trim", "lo"))
        .unionAll(rung(2, "ws_collapse", "ws"))
        .unionAll(rung(3, "alnum_only", "al"))
    )
    return u.select(
        "rung",
        "policy",
        "n_docs",
        "n_distinct",
        (F.col("n_docs") - F.col("n_distinct")).cast("bigint").alias("n_removed"),
        F.expr("(10000 * (n_docs - n_distinct)) div n_docs")
        .cast("bigint")
        .alias("removed_bp"),
    ).orderBy("rung")


# --- round-11 wave 3: q451 LSH S-curve expected recall ------------------------

#: K = b*r = 16 hash budget split four ways (the q427/q28 sizing space).
_SCURVE_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8))
#: Jaccard grid denominator: buckets i/20, i in 0..20.
_SCURVE_G = 20
#: Shared exact denominator 20^16 (every config has r*b = 16).
_SCURVE_D = _SCURVE_G ** 16


def _scurve_rows() -> list[tuple[int, int, int, int]]:
    """Exact collision probabilities p = 1 - (1 - s^r)^b at s = i/20,
    as basis points — PURE INTEGER arithmetic (Python bignums), so the
    same literal grid inlines into both engines with zero libm risk
    (the q31b md5-literal discipline applied to the S-curve)."""
    rows = []
    for b, r in _SCURVE_CONFIGS:
        for i in range(5, _SCURVE_G + 1):  # buckets at jaccard >= 0.25
            miss = (_SCURVE_G ** r - i ** r) ** b  # (1-s^r)^b numerator
            p_bp = (10000 * (_SCURVE_D - miss)) // _SCURVE_D
            rows.append((b, r, i, p_bp))
    return rows


_SCURVE_VALUES = ", ".join(f"({b}, {r}, {i}, {p})" for b, r, i, p in _scurve_rows())

_DUCK_SCURVE = f"""
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
      GROUP BY 1, 2),
         bkt AS (
      SELECT (20 * shared) // (sa.sz + sb.sz - shared) AS i,
             count(*) AS cnt
      FROM shared JOIN sz sa ON id_a = sa.doc_id
                  JOIN sz sb ON id_b = sb.doc_id
      WHERE (20 * shared) // (sa.sz + sb.sz - shared) >= 5
      GROUP BY 1),
         grid(bands, rows_per_band, i, p_bp) AS (VALUES {_SCURVE_VALUES})
    SELECT bands, rows_per_band,
           CAST(sum(cnt) AS BIGINT) AS n_pairs,
           CAST(sum(cnt * p_bp) // 10 AS BIGINT) AS exp_caught_milli,
           CAST(sum(cnt * p_bp) // sum(cnt) AS BIGINT) AS exp_recall_bp
    FROM grid JOIN bkt USING (i)
    GROUP BY 1, 2
    ORDER BY bands
"""


@register("q451_lsh_scurve_recall", _DUCK_SCURVE)
def q451_lsh_scurve_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH S-curve parameter advisor — expected MinHash-LSH recall of
    the corpus's OBSERVED near-dup pair population under every (bands,
    rows-per-band) split of a K=16 hash budget (Leskovec-Rajaraman-
    Ullman ch.3 S-curve, evaluated against real data instead of a
    textbook threshold): collision probability p(s) = 1 - (1 - s^r)^b
    is computed EXACTLY (Python-bignum integer grid, the q31b
    inline-literal discipline — NO pow/libm in either engine) at
    Jaccard buckets i/20, and the exact q27 pair table supplies how
    much pair mass sits in each bucket. POPULATION FLOOR (ADVICE
    r11): "observed pair population" means pairs with Jaccard >=
    0.25 (bucket i >= 5) — both engines truncate the bucket grid
    there, so exp_recall_bp is recall OF THAT POPULATION and
    overstates whole-corpus recall for low-band configs whose misses
    concentrate below the floor. The floor keeps the p_bp literal
    grid at 4x16 entries and matches the q28 candidate-generation
    regime (sub-0.25 pairs are never LSH targets). The output says
    which (b, r) to configure q28's LSH with to hit a target recall
    on THIS corpus — the measured answer to the sizing question q427
    calibrates.

    Determinism: pair buckets are integer divisions of exact shingle
    counts ((20*shared) div (union)); the p_bp grid is 64 inlined
    integer literals; every aggregate is an integer sum.

    100 TB shape: the pair table is the q27 inverted-index shape (at
    production scale swap in q27b's exact-dedup-first funnel — same
    raw-counts prefix); the grid join is a broadcast of 64 literal
    rows; output is |configs| = 4 rows."""
    docs = load_table(spark, sf_dir, "documents")
    raw = jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=None, raw_counts=True
    )
    bkt = (
        raw.select(
            F.expr("(20 * shared) div (sz_a + sz_b - shared)").alias("i")
        )
        .filter(F.col("i") >= 5)
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grid = spark.createDataFrame(
        _scurve_rows(), "bands INT, rows_per_band INT, i BIGINT, p_bp BIGINT"
    )
    return (
        bkt.join(F.broadcast(grid), "i")
        .groupBy("bands", "rows_per_band")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_pairs"),
            F.expr("sum(cnt * p_bp) div 10").cast("bigint").alias("exp_caught_milli"),
            F.expr("sum(cnt * p_bp) div sum(cnt)")
            .cast("bigint")
            .alias("exp_recall_bp"),
        )
        .orderBy("bands")
    )


# --- round-11 wave 3: q454 dedup scope census ---------------------------------

_DUCK_SCOPE = """
    WITH d AS (
      SELECT doc_id, source, md5(text) AS k FROM documents),
         ks AS (
      SELECT k, source, min(doc_id) AS mdoc, count(*) AS c
      FROM d GROUP BY k, source),
         kg AS (
      SELECT k, min_by(source, mdoc) AS owner FROM ks GROUP BY k),
         owned AS (
      SELECT owner AS source, count(*) AS keys_owned FROM kg GROUP BY owner),
         per_src AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM ks GROUP BY source)
    SELECT p.source,
           p.n_docs,
           CAST(p.n_docs - p.n_keys AS BIGINT) AS removed_within,
           CAST(p.n_docs - coalesce(o.keys_owned, 0) AS BIGINT) AS removed_global,
           CAST((p.n_docs - coalesce(o.keys_owned, 0))
                - (p.n_docs - p.n_keys) AS BIGINT) AS removed_cross_only
    FROM per_src p LEFT JOIN owned o USING (source)
    ORDER BY p.source
"""


@register("q454_dedup_scope_census", _DUCK_SCOPE)
def q454_dedup_scope_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup SCOPE ablation — what global (cross-source) exact dedup
    removes beyond within-source dedup, per source (the policy choice
    Dolma documents explicitly: its exact dedup ran within-source
    only, while C4/RefinedWeb dedup globally; the gap is exactly the
    cross-source duplicate mass this census measures). Survivor rule
    is q26's min-doc_id, extended to scope: a doc is removed GLOBALLY
    iff its digest's corpus-wide min doc_id lies elsewhere, WITHIN
    iff its digest's min doc_id in its own source lies elsewhere —
    so removed_cross_only = docs only a global pass would catch.

    All counts derive from ONE (digest, source) census: within-source
    removals are n_docs - n_keys per source; global removals are
    n_docs minus the keys whose corpus-wide survivor (min_by
    (mdoc, source) struct extremum — the q55 tie-break discipline;
    doc_id is unique so no source tie exists) lives in the source.
    No join back to the corpus.

    100 TB shape: one digest-keyed map-side-combinable aggregate
    (shuffles md5 digests, never text), one |distinct-digests|-row
    reduce, and a broadcast join of two |sources|-row frames."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "source", F.md5(F.col("text")).alias("k"))
    ks = d.groupBy("k", "source").agg(
        F.min("doc_id").alias("mdoc"), F.count(F.lit(1)).alias("c")
    )
    kg = ks.groupBy("k").agg(
        F.min(F.struct(F.col("mdoc"), F.col("source"))).alias("m")
    )
    owned = kg.groupBy(F.col("m.source").alias("source")).agg(
        F.count(F.lit(1)).alias("keys_owned")
    )
    per_src = ks.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return (
        per_src.join(F.broadcast(owned), "source", "left")
        .select(
            "source",
            "n_docs",
            (F.col("n_docs") - F.col("n_keys"))
            .cast("bigint")
            .alias("removed_within"),
            (F.col("n_docs") - F.coalesce(F.col("keys_owned"), F.lit(0)))
            .cast("bigint")
            .alias("removed_global"),
            (
                (F.col("n_docs") - F.coalesce(F.col("keys_owned"), F.lit(0)))
                - (F.col("n_docs") - F.col("n_keys"))
            )
            .cast("bigint")
            .alias("removed_cross_only"),
        )
        .orderBy("source")
    )


# --- round-11 wave 4: q456 SemDeDup K sizing curve ----------------------------

_SEMK_GRID = (2, 4, 8, 16)

_DUCK_SEMK = f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {max(_SEMK_GRID)}),
         al AS (
      SELECT v.vec_id, c.cid,
             CAST(round(1000000 * list_aggregate(
                 list_transform(generate_series(1, len(e)),
                                i -> (e[i] - ce[i]) * (e[i] - ce[i])),
                 'sum')) AS BIGINT) AS d2
      FROM v CROSS JOIN c),
         grid AS (SELECT unnest([{", ".join(str(k) for k in _SEMK_GRID)}]) AS k),
         asg AS (
      SELECT g.k, a.vec_id, a.cid, a.d2,
             row_number() OVER (PARTITION BY g.k, a.vec_id
                                ORDER BY a.d2, a.cid) AS rn
      FROM al a JOIN grid g ON a.cid < g.k),
         cl AS (
      SELECT k, cid, count(*) AS sz, sum(d2) AS s2
      FROM asg WHERE rn = 1 GROUP BY k, cid)
    SELECT k,
           CAST(sum(sz) AS BIGINT) AS n_vecs,
           CAST(count(*) AS BIGINT) AS clusters_used,
           CAST(max(sz) AS BIGINT) AS max_cluster,
           CAST(sum((sz * (sz - 1)) // 2) AS BIGINT) AS candidate_pairs,
           CAST(sum(s2) AS BIGINT) AS inertia_e6
    FROM cl GROUP BY k ORDER BY k
"""


@register("q456_semdedup_k_curve", _DUCK_SEMK)
def q456_semdedup_k_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup K sizing curve — the measurement behind choosing the
    centroid count (Abbas'23 clusters with k-means K in the tens of
    thousands at web scale; q151 pins K=8 for its oracle and q151b
    argues K ~ sqrt(n)): for each K in {_SEMK_GRID}, assign every
    embedding to its nearest first-K centroid (q151's deterministic
    rule) and report what K buys — within-cluster candidate-pair
    volume sum sz*(sz-1)/2 (the cost SemDeDup's pairwise pass
    actually pays, computed from cluster SIZES without materializing
    a single pair), inertia (e6-quantized squared distance, the
    cluster-quality side of the trade), and the max cluster (the
    straggler that bounds the slowest task). The K-grid is NESTED
    (first-2 ⊂ first-4 ⊂ ...), so ONE distance evaluation against the
    16-centroid panel serves every K — four curves from one corpus
    pass. This closes the knob-sizing quartet: q427 calibrates
    MinHash, q437 tunes IVF nprobe, q451 sizes LSH bands, q456 sizes
    SemDeDup K.

    Determinism: per-(vector, centroid) squared distances are
    index-ordered folds (the q151/q102 engine-identical contract),
    e6-quantized BEFORE any cross-row sum; argmin ties break on cid
    via struct ordering = the oracle's ORDER BY d2, cid.

    100 TB shape: the centroid panel is collect_list'd to ONE row and
    broadcast (K <= 16 here; K ~ sqrt(n) stays broadcastable); each
    vector computes all 16 distances and all four argmins IN-ROW (no
    crossJoin row expansion); the only shuffles carry (k, cid, d2) —
    4 rows per vector — into two keyed integer aggregates."""
    from ooh_etl_spark.tables import parallelize_rows

    kmax = max(_SEMK_GRID)
    emb = parallelize_rows(load_table(spark, sf_dir, "embeddings"))
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    c = v.filter(F.col("vec_id") < kmax).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    cagg = c.agg(F.collect_list(F.struct("cid", "ce")).alias("cents"))
    ds = v.crossJoin(F.broadcast(cagg)).select(
        "vec_id",
        F.expr(
            "transform(cents, c -> named_struct("
            " 'cid', c.cid,"
            " 'd2', CAST(round(1000000 * aggregate("
            "   zip_with(e, c.ce, (x, y) -> (x - y) * (x - y)),"
            "   CAST(0 AS DOUBLE), (a, t) -> a + t)) AS BIGINT)))"
        ).alias("ds"),
    )
    rows = ds.select(
        "vec_id",
        F.expr(
            f"explode(transform(array({', '.join(str(k) for k in _SEMK_GRID)}),"
            " k -> named_struct('k', k, 'a',"
            "   array_min(transform(filter(ds, d -> d.cid < k),"
            "     d -> named_struct('d2', d.d2, 'cid', d.cid))))))"
        ).alias("p"),
    ).select(F.col("p.k").alias("k"), F.col("p.a.cid").alias("cid"), F.col("p.a.d2").alias("d2"))
    cl = rows.groupBy("k", "cid").agg(
        F.count(F.lit(1)).alias("sz"), F.sum("d2").alias("s2")
    )
    return (
        cl.groupBy("k")
        .agg(
            F.sum("sz").cast("bigint").alias("n_vecs"),
            F.count(F.lit(1)).cast("bigint").alias("clusters_used"),
            F.max("sz").cast("bigint").alias("max_cluster"),
            F.expr("sum((sz * (sz - 1)) div 2)")
            .cast("bigint")
            .alias("candidate_pairs"),
            F.sum("s2").cast("bigint").alias("inertia_e6"),
        )
        .orderBy("k")
    )


# --- round-11 wave 4: q457 stop-shingle df-cap ablation -----------------------

#: df caps for the ablation: uncapped sentinel, then the two realistic
#: stop-shingle cut levels.
_DFCAP_GRID = (1000000000, 64, 16)

_DUCK_DFCAP = f"""
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
         dft AS (SELECT shingle, count(*) AS df FROM inv GROUP BY shingle),
         caps AS (SELECT unnest([{", ".join(str(x) for x in _DFCAP_GRID)}]) AS cap_df),
         vol AS (
      SELECT cap_df,
             CAST(count(*) AS BIGINT) AS n_shingles_kept,
             CAST(sum((df * (df - 1)) // 2) AS BIGINT) AS candidate_pairs
      FROM dft JOIN caps ON df <= cap_df GROUP BY cap_df),
         shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
         tp AS (
      SELECT id_a, id_b
      FROM shared JOIN sz sa ON id_a = sa.doc_id
                  JOIN sz sb ON id_b = sb.doc_id
      WHERE round(shared / (sa.sz + sb.sz - shared), 4) >= 0.5),
         ps AS (
      SELECT t.id_a, t.id_b, min(f.df) AS mindf
      FROM tp t
      JOIN inv a ON a.doc_id = t.id_a
      JOIN inv b ON b.doc_id = t.id_b AND b.shingle = a.shingle
      JOIN dft f ON f.shingle = a.shingle
      GROUP BY 1, 2),
         ntp AS (SELECT count(*) AS n FROM tp),
         cov AS (
      SELECT c.cap_df, count(*) AS covered
      FROM ps CROSS JOIN caps c
      WHERE ps.mindf <= c.cap_df
      GROUP BY c.cap_df)
    SELECT c.cap_df,
           CAST(coalesce(v.n_shingles_kept, 0) AS BIGINT) AS n_shingles_kept,
           CAST(coalesce(v.candidate_pairs, 0) AS BIGINT) AS candidate_pairs,
           CAST(ntp.n AS BIGINT) AS true_pairs,
           CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_true_pairs,
           CAST(CASE WHEN ntp.n = 0 THEN 10000
                     ELSE (10000 * coalesce(cov.covered, 0)) // ntp.n
                END AS BIGINT) AS coverage_bp
    FROM caps c LEFT JOIN vol v ON c.cap_df = v.cap_df
                LEFT JOIN cov ON c.cap_df = cov.cap_df
                CROSS JOIN ntp
    ORDER BY c.cap_df DESC
"""


@register("q457_stop_shingle_ablation", _DUCK_DFCAP)
def q457_stop_shingle_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-shingle df-cap ablation — SCALE.md's standing scale note
    for the q27 inverted index ("at extreme scale drop stop-shingles
    by document frequency first") turned into a measurement, exactly
    as q307 measures the RR/PC tension for linkage blocking: for each
    df cap, (a) the CANDIDATE-PAIR VOLUME the index would generate,
    computed from the df census alone as sum df*(df-1)/2 over
    surviving shingles — no pair is ever materialized for the cost
    side — and (b) the RECALL side: how many of the corpus's TRUE
    near-dup pairs (exact Jaccard >= 0.5, q27's definition) still
    share at least one surviving shingle (min shared-shingle df <=
    cap). Dropping hot shingles collapses candidate volume
    super-linearly (the hottest lists are quadratic contributors)
    while true pairs survive as long as ONE rare shared shingle
    remains — the measured justification for the stop-shingle cut.

    Determinism: all counts integer; coverage is an integer bp ratio.

    100 TB shape: the cost curve needs only the (shingle, df) census
    — one explode + one keyed aggregate; the recall audit joins
    postings restricted to docs already in the (small) true-pair set,
    so its pair expansion is bounded by the true-dup population, not
    the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_sets(docs, "text", "doc_id", 3)
    inv = sh.select(F.col("id"), F.explode_outer("sh").alias("shingle"))
    dft = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    caps = spark.createDataFrame(
        [(c,) for c in _DFCAP_GRID], "cap_df BIGINT"
    )
    # caps is the preserved side: a cap that kills EVERY shingle still
    # emits a 0-kept / 0-candidate row (ADVICE r11) — aggregate the
    # inner join first (bounded |grid| rows), then left-join from caps.
    volagg = (
        dft.join(F.broadcast(caps), F.col("df") <= F.col("cap_df"))
        .groupBy("cap_df")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("kept_nn"),
            F.expr("sum((df * (df - 1)) div 2)").cast("bigint").alias("cand_nn"),
        )
    )
    vol = caps.join(volagg, "cap_df", "left").select(
        "cap_df",
        F.coalesce(F.col("kept_nn"), F.lit(0))
        .cast("bigint")
        .alias("n_shingles_kept"),
        F.coalesce(F.col("cand_nn"), F.lit(0))
        .cast("bigint")
        .alias("candidate_pairs"),
    )
    tp = jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5).select(
        "id_a", "id_b"
    )
    invdf = inv.join(dft, "shingle")
    a = invdf.select(
        F.col("id").alias("id_a"), "shingle", F.col("df").alias("df_a")
    )
    b = invdf.select(F.col("id").alias("id_b2"), F.col("shingle").alias("sh_b"))
    ps = (
        tp.join(a, "id_a")
        .join(
            b,
            (F.col("id_b") == F.col("id_b2"))
            & (F.col("shingle") == F.col("sh_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.min("df_a").alias("mindf"))
    )
    ntp = tp.agg(F.count(F.lit(1)).alias("n"))
    cov = (
        ps.crossJoin(F.broadcast(caps))
        .filter(F.col("mindf") <= F.col("cap_df"))
        .groupBy("cap_df")
        .agg(F.count(F.lit(1)).alias("covered"))
    )
    return (
        vol.join(cov, "cap_df", "left")
        .crossJoin(F.broadcast(ntp))
        .select(
            "cap_df",
            "n_shingles_kept",
            "candidate_pairs",
            F.col("n").cast("bigint").alias("true_pairs"),
            F.coalesce(F.col("covered"), F.lit(0))
            .cast("bigint")
            .alias("covered_true_pairs"),
            F.expr(
                "CAST(CASE WHEN n = 0 THEN 10000"
                " ELSE (10000 * coalesce(covered, 0)) div n END AS BIGINT)"
            ).alias("coverage_bp"),
        )
        .orderBy(F.col("cap_df").desc())
    )


# --- round-11 wave 4: q458 IVF centroid drift census --------------------------

_DRIFT_K = 8

_DUCK_DRIFT = f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ca AS (
      SELECT vec_id AS cid, e AS ce,
             row_number() OVER (ORDER BY vec_id) AS rk
      FROM v WHERE vec_id % 2 = 0),
         pa AS (SELECT cid, ce FROM ca WHERE rk <= {_DRIFT_K}),
         pb AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_DRIFT_K}),
         da AS (
      SELECT v.vec_id, p.cid,
             CAST(round(1000000 * list_aggregate(
                 list_transform(generate_series(1, len(e)),
                                i -> (e[i] - ce[i]) * (e[i] - ce[i])),
                 'sum')) AS BIGINT) AS d2,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY CAST(round(1000000 * list_aggregate(
                                    list_transform(generate_series(1, len(e)),
                                                   i -> (e[i] - ce[i]) * (e[i] - ce[i])),
                                    'sum')) AS BIGINT), p.cid) AS rn
      FROM v CROSS JOIN pa p),
         db AS (
      SELECT v.vec_id, p.cid,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY CAST(round(1000000 * list_aggregate(
                                    list_transform(generate_series(1, len(e)),
                                                   i -> (e[i] - ce[i]) * (e[i] - ce[i])),
                                    'sum')) AS BIGINT), p.cid) AS rn
      FROM v CROSS JOIN pb p),
         j AS (
      SELECT a.vec_id, a.cid AS cell_old, b.cid AS cell_new
      FROM (SELECT vec_id, cid FROM da WHERE rn = 1) a
      JOIN (SELECT vec_id, cid FROM db WHERE rn = 1) b USING (vec_id))
    SELECT cell_old,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN cell_old <> cell_new THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved,
           CAST((10000 * sum(CASE WHEN cell_old <> cell_new THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS moved_bp
    FROM j GROUP BY cell_old ORDER BY cell_old
"""


@register("q458_ivf_centroid_drift", _DUCK_DRIFT)
def q458_ivf_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF centroid drift census — the index-staleness measurement an
    ANN serving stack needs before deciding to re-train (FAISS's
    standing operational question; Lance/Milvus re-index triggers):
    assign every vector to its nearest cell under the OLD centroid
    panel (first-{_DRIFT_K} of the even-id half — the index built on
    yesterday's data) and under the NEW panel (first-{_DRIFT_K}
    overall — today's rebuild), and report per-old-cell how many
    vectors would CHANGE cells. High churn cells are where recall
    degrades if the stale index keeps serving (their posting lists no
    longer match the true partition); near-zero churn says the
    rebuild can wait. Cells are compared by centroid vec_id, which
    both panels draw from the same id space.

    Determinism: the q456/q151 contract — index-ordered squared-
    distance folds, e6-quantized BEFORE the argmin, ties to the
    smaller cid.

    100 TB shape: both panels collapse to one broadcast row each;
    both argmins are computed IN-ROW against the {2 * _DRIFT_K}
    combined centroids in a single corpus pass; the only shuffle
    carries (cell_old, moved-bit) into one {_DRIFT_K}-row
    aggregate."""
    from ooh_etl_spark.tables import parallelize_rows

    emb = parallelize_rows(load_table(spark, sf_dir, "embeddings"))
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    # First-K even ids BY RANK (TakeOrderedAndProject top-K, not a
    # density assumption): matches the oracle's row_number() rule on
    # id spaces with gaps in the low even ids.
    pa = (
        v.filter(F.col("vec_id") % 2 == 0)
        .orderBy("vec_id")
        .limit(_DRIFT_K)
        .select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
    )
    pb = v.filter(F.col("vec_id") < _DRIFT_K).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    panels = pa.agg(F.collect_list(F.struct("cid", "ce")).alias("pa")).crossJoin(
        pb.agg(F.collect_list(F.struct("cid", "ce")).alias("pb"))
    )
    argmin = (
        "array_min(transform({panel}, c -> named_struct("
        " 'd2', CAST(round(1000000 * aggregate("
        "   zip_with(e, c.ce, (x, y) -> (x - y) * (x - y)),"
        "   CAST(0 AS DOUBLE), (a, t) -> a + t)) AS BIGINT),"
        " 'cid', c.cid))).cid"
    )
    j = v.crossJoin(F.broadcast(panels)).select(
        "vec_id",
        F.expr(argmin.format(panel="pa")).alias("cell_old"),
        F.expr(argmin.format(panel="pb")).alias("cell_new"),
    )
    return (
        j.groupBy("cell_old")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(
                F.when(F.col("cell_old") != F.col("cell_new"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_moved"),
            F.expr(
                "(10000 * sum(CASE WHEN cell_old <> cell_new THEN 1 ELSE 0 END))"
                " div count(*)"
            )
            .cast("bigint")
            .alias("moved_bp"),
        )
        .orderBy("cell_old")
    )


# --- round-12 wave: q463 splice-boundary overlap audit ------------------------

_SPLICE_K = 3  # boundary key length in tokens (non-degenerate at fixture sfs)
_SPLICE_TOP = 20

_DUCK_SPLICE = f"""
    WITH d AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
         keys AS (
      SELECT doc_id,
             array_to_string(toks[1:{_SPLICE_K}], ' ') AS pre,
             array_to_string(toks[len(toks) - {_SPLICE_K} + 1:len(toks)], ' ')
               AS suf
      FROM d WHERE len(toks) >= {_SPLICE_K}),
         pc AS (SELECT pre AS k, count(*) AS n_pre,
                       sum(CASE WHEN pre = suf THEN 1 ELSE 0 END) AS self_c
                FROM keys GROUP BY pre),
         sc AS (SELECT suf AS k, count(*) AS n_suf FROM keys GROUP BY suf),
         m AS (
      SELECT pc.k, n_pre, n_suf,
             CAST(n_suf * n_pre - self_c AS BIGINT) AS splice_pairs
      FROM pc JOIN sc ON pc.k = sc.k)
    SELECT k AS boundary_key,
           CAST(n_pre AS BIGINT) AS n_prefix_docs,
           CAST(n_suf AS BIGINT) AS n_suffix_docs,
           splice_pairs
    FROM m WHERE splice_pairs > 0
    ORDER BY splice_pairs DESC, boundary_key LIMIT {_SPLICE_TOP}
"""


@register("q463_splice_boundary_overlap", _DUCK_SPLICE)
def q463_splice_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Splice-boundary overlap audit — the chunking-artifact detector
    for corpora assembled from sliding windows or re-joined fragments
    (the q468/q74 chunkers create them; Lee et al. 2022 §5 notes
    boundary duplicates evade whole-doc dedup): a document whose
    {_SPLICE_K}-token SUFFIX equals another document's {_SPLICE_K}-
    token PREFIX is a splice candidate — the two are adjacent windows
    of one original. Reported per boundary key with the pair volume
    n_suf * n_pre (minus self-pairs where one doc's own prefix equals
    its own suffix), top-{_SPLICE_TOP} hottest keys.

    Determinism: exact token-key equality; integer counts; total
    order on (pairs desc, key).

    100 TB shape: NO pair is materialized — each doc emits its two
    (key, role) markers in-row and ONE key-grouped aggregate carries
    both censuses plus the self-pair correction (a pc-join-sc form
    would re-run the tokenize scan on both sides — the q296
    multi-consumer class); the pair count is a product of the two
    census columns. The quadratic object stays arithmetic."""
    from ooh_etl_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("toks")).filter(
        F.size("toks") >= _SPLICE_K
    )
    keys = toks.select(
        F.array_join(F.slice("toks", 1, _SPLICE_K), " ").alias("pre"),
        F.array_join(
            F.slice("toks", -_SPLICE_K, _SPLICE_K), " "
        ).alias("suf"),
    )
    marks = keys.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pre").alias("k"),
                    F.lit(1).alias("is_pre"),
                    F.lit(0).alias("is_suf"),
                    F.when(F.col("pre") == F.col("suf"), 1)
                    .otherwise(0)
                    .alias("self_m"),
                ),
                F.struct(
                    F.col("suf").alias("k"),
                    F.lit(0).alias("is_pre"),
                    F.lit(1).alias("is_suf"),
                    F.lit(0).alias("self_m"),
                ),
            )
        ).alias("m")
    )
    census = marks.groupBy(F.col("m.k").alias("k")).agg(
        F.sum("m.is_pre").alias("n_pre"),
        F.sum("m.is_suf").alias("n_suf"),
        F.sum("m.self_m").alias("self_c"),
    )
    return (
        census.filter((F.col("n_pre") > 0) & (F.col("n_suf") > 0))
        .select(
            F.col("k").alias("boundary_key"),
            F.col("n_pre").cast("bigint").alias("n_prefix_docs"),
            F.col("n_suf").cast("bigint").alias("n_suffix_docs"),
            (F.col("n_suf") * F.col("n_pre") - F.col("self_c"))
            .cast("bigint")
            .alias("splice_pairs"),
        )
        .filter(F.col("splice_pairs") > 0)
        .orderBy(F.col("splice_pairs").desc(), "boundary_key")
        .limit(_SPLICE_TOP)
    )


# --- round-12 wave: q464 cross-source duplicate matrix ------------------------

_DUCK_BOW = (
    "md5(array_to_string(list_sort(list_distinct("
    + _DUCK_TOKS
    + ")), ' '))"
)


def _bow_digest() -> "F.Column":
    """Bag-of-words content fingerprint: md5 of the sorted distinct
    token set — canonical under token re-ordering (mirror/template
    detection, the rung above q450's whitespace/alnum ladder)."""
    from ooh_etl_spark.functions.text import tokenize

    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokenize(F.col("text")))), " ")
    )

_DUCK_DUPMATRIX = f"""
    WITH ks AS (
      SELECT DISTINCT {_DUCK_BOW} AS k, source FROM documents),
         pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared
      FROM ks a JOIN ks b ON a.k = b.k AND a.source < b.source
      GROUP BY 1, 2)
    SELECT source_a, source_b, CAST(shared AS BIGINT) AS shared_digests
    FROM pairs ORDER BY shared_digests DESC, source_a, source_b
"""


@register("q464_cross_source_dup_matrix", _DUCK_DUPMATRIX)
def q464_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate provenance matrix — WHICH sources share
    content with which (the Dolma/RedPajama curation question behind
    q454's scope census: q454 says how much cross-source mass exists;
    this says where it flows, e.g. a mirror site or a crawl overlap
    between two specific feeds): per unordered source pair, the count
    of shared content fingerprints. The fingerprint is the BAG-OF-
    WORDS digest (md5 of the sorted distinct token set) — the
    normalization rung above q450's ladder that catches re-ordered /
    re-templated mirrors exact-byte digests miss (and the rung that
    is actually non-trivial on this fixture: its byte-exact dup count
    is zero).

    Determinism: md5 over a SORTED token set — order-canonical in
    both engines; integer counts, total output order.

    100 TB shape: ONE corpus scan collapses to the digest-keyed
    source-set census (collect_set is bounded by |sources| <= 20 per
    key, map-side combinable, never ships text); the pair expansion
    is an IN-ROW combination explode of that bounded set — no
    self-join, so the census is computed once (a ks-vs-ks join would
    re-execute the digest scan on both sides, the q296 multi-consumer
    class); output <= C(|sources|, 2) rows."""
    docs = load_table(spark, sf_dir, "documents")
    ks = (
        docs.select(_bow_digest().alias("k"), "source")
        .groupBy("k")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    pairs = ks.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (a, i) ->"
                " transform(slice(ss, i + 2, size(ss) - i - 1),"
                " b -> struct(a AS source_a, b AS source_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_digests"))
        .orderBy(F.col("shared_digests").desc(), "source_a", "source_b")
    )


# --- round-12 wave: q466 dedup survivor-policy ablation -----------------------

_DUCK_SURVIVOR = f"""
    WITH d AS (
      SELECT doc_id, n_chars, {_DUCK_BOW} AS k FROM documents),
         grp AS (
      SELECT k, count(*) AS sz,
             min(doc_id) AS min_id,
             sum(n_chars) AS chars_all
      FROM d GROUP BY k HAVING count(*) > 1),
         ranked AS (
      SELECT d.k, d.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY d.k
                                ORDER BY d.n_chars DESC, d.doc_id) AS rk
      FROM d JOIN grp USING (k)),
         pol AS (
      SELECT g.k, g.sz,
             mi.n_chars AS minid_chars,
             mx.doc_id AS maxlen_id, mx.n_chars AS maxlen_chars,
             g.min_id
      FROM grp g
      JOIN d mi ON mi.k = g.k AND mi.doc_id = g.min_id
      JOIN (SELECT k, doc_id, n_chars FROM ranked WHERE rk = 1) mx
        ON mx.k = g.k)
    SELECT CAST(count(*) AS BIGINT) AS n_dup_groups,
           CAST(sum(sz) AS BIGINT) AS n_dup_docs,
           CAST(sum(CASE WHEN maxlen_id <> min_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_divergent,
           CAST(sum(minid_chars) AS BIGINT) AS minid_kept_chars,
           CAST(sum(maxlen_chars) AS BIGINT) AS maxlen_kept_chars,
           CAST(sum(maxlen_chars) - sum(minid_chars) AS BIGINT)
             AS extra_chars_kept,
           CAST((10000 * sum(CASE WHEN maxlen_id <> min_id THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS divergent_bp
    FROM pol
"""


@register("q466_dedup_survivor_policy", _DUCK_SURVIVOR)
def q466_dedup_survivor_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivor-policy ablation — WHICH copy to keep (q26 keeps
    min-doc_id, the reproducibility default; RefinedWeb/CCNet keep
    the LONGEST copy, betting truncated mirrors are the duplicates):
    over every duplicate group under the bag-of-words fingerprint
    (q464's mirror-detection rung — the groups where copies really DO
    differ in length), compare the two policies — how often they pick
    different survivors, and how much content mass (chars) the
    longest-copy policy retains over min-id. A high divergent_bp with
    positive extra_chars_kept is the measured case for the quality-
    aware survivor rule.

    Determinism: both survivors are struct extrema under TOTAL orders
    — min-id survivor = min(doc_id, n_chars), longest survivor =
    max(n_chars, -doc_id, doc_id) (largest n_chars, tie to the
    SMALLER doc_id) — no engine-specific max_by tie-break; all
    outputs integer.

    100 TB shape: ONE corpus scan, ONE digest-keyed map-side-
    combinable aggregate carrying both survivors as struct extrema
    (shuffles md5 + three ints, never text — no join-back to the
    corpus, no per-group window), then a single-row reduce over the
    duplicate groups."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "n_chars", _bow_digest().alias("k"))
    pol = (
        d.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.min("doc_id").alias("min_id"),
            F.min(F.struct("doc_id", "n_chars"))
            .getField("n_chars")
            .alias("minid_chars"),
            F.max(
                F.struct(
                    "n_chars", (-F.col("doc_id")).alias("nid"), "doc_id"
                )
            ).alias("mx"),
        )
        .filter(F.col("sz") > 1)
        .select(
            "sz",
            "min_id",
            "minid_chars",
            F.col("mx.doc_id").alias("maxlen_id"),
            F.col("mx.n_chars").alias("maxlen_chars"),
        )
    )
    return pol.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_groups"),
        F.sum("sz").cast("bigint").alias("n_dup_docs"),
        F.sum(F.when(F.col("maxlen_id") != F.col("min_id"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_divergent"),
        F.sum("minid_chars").cast("bigint").alias("minid_kept_chars"),
        F.sum("maxlen_chars").cast("bigint").alias("maxlen_kept_chars"),
        (F.sum("maxlen_chars") - F.sum("minid_chars"))
        .cast("bigint")
        .alias("extra_chars_kept"),
        F.expr(
            "(10000 * sum(CASE WHEN maxlen_id <> min_id THEN 1 ELSE 0 END))"
            " div count(*)"
        )
        .cast("bigint")
        .alias("divergent_bp"),
    )


# --- round-12 wave: q472 in-batch duplicate collision curve -------------------

_BATCH_GRID = (8, 32, 128)
_COLL_SHARDS = 8

_DUCK_COLLISION = f"""
    WITH g AS (SELECT unnest([{", ".join(str(x) for x in _BATCH_GRID)}])
                 AS batch_size),
         d AS (
      SELECT doc_id, {_DUCK_BOW} AS fp,
             md5(concat('epoch0#', CAST(doc_id AS VARCHAR))) AS h
      FROM documents),
         placed AS (
      SELECT doc_id, fp, h,
             CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % {_COLL_SHARDS}
               AS shard
      FROM d),
         pos AS (
      SELECT fp, shard,
             row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS p
      FROM placed),
         batched AS (
      SELECT g.batch_size, shard, (p - 1) // g.batch_size AS batch, fp
      FROM pos CROSS JOIN g),
         per_fp AS (
      SELECT batch_size, shard, batch, count(*) AS c
      FROM batched GROUP BY batch_size, shard, batch, fp),
         per_batch AS (
      SELECT batch_size, shard, batch,
             sum((c * (c - 1)) // 2) AS pairs
      FROM per_fp GROUP BY batch_size, shard, batch)
    SELECT CAST(batch_size AS BIGINT) AS batch_size,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(CASE WHEN pairs > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS colliding_batches,
           CAST(sum(pairs) AS BIGINT) AS dup_pairs_in_batch,
           CAST((10000 * sum(CASE WHEN pairs > 0 THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS colliding_bp
    FROM per_batch GROUP BY batch_size ORDER BY batch_size
"""


@register("q472_inbatch_collision_curve", _DUCK_COLLISION)
def q472_inbatch_collision_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-batch duplicate collision curve — the contrastive-training
    batch-size question (SimCLR/CLIP-style in-batch negatives treat
    every other batch member as a negative; a DUPLICATE in the batch
    is a false negative that actively corrupts the loss): under
    q203's deterministic sharded epoch shuffle, for each candidate
    batch size, how many batches contain at least two documents with
    the same content fingerprint (q464's bag-of-words rung) and how
    many duplicate pairs land in-batch. Bigger batches collide more —
    this prices that against the batch-size benefit, and says whether
    near-dedup must run BEFORE contrastive pretraining at this
    duplication level.

    Determinism: q203's shuffle exactly (md5 position key, hash-slice
    shard, rank within shard — no RNG); integer pair counts.

    100 TB shape: the shuffle windows are PARTITIONED BY shard
    (q203's scale argument); the collision census is one
    (batch_size, shard, batch, fp) map-side-combinable aggregate
    whose pair counts come from group sizes — no pair materialized;
    output |grid| rows."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        _bow_digest().alias("fp"),
        F.md5(F.concat(F.lit("epoch0#"), F.col("doc_id").cast("string"))).alias(
            "h"
        ),
    )
    placed = d.withColumn(
        "shard",
        F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint") % _COLL_SHARDS,
    )
    wp = Window.partitionBy("shard").orderBy("h", "doc_id")
    pos = placed.select("fp", "shard", F.row_number().over(wp).alias("p"))
    grid = spark.createDataFrame(
        [(x,) for x in _BATCH_GRID], "batch_size BIGINT"
    )
    per_fp = (
        pos.crossJoin(F.broadcast(grid))
        .select(
            "batch_size",
            "shard",
            F.expr("(p - 1) div batch_size").alias("batch"),
            "fp",
        )
        .groupBy("batch_size", "shard", "batch", "fp")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_batch = per_fp.groupBy("batch_size", "shard", "batch").agg(
        F.expr("sum((c * (c - 1)) div 2)").alias("pairs")
    )
    return (
        per_batch.groupBy("batch_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_batches"),
            F.sum(F.when(F.col("pairs") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("colliding_batches"),
            F.sum("pairs").cast("bigint").alias("dup_pairs_in_batch"),
            F.expr(
                "(10000 * sum(CASE WHEN pairs > 0 THEN 1 ELSE 0 END))"
                " div count(*)"
            )
            .cast("bigint")
            .alias("colliding_bp"),
        )
        .select(
            F.col("batch_size").cast("bigint").alias("batch_size"),
            "n_batches", "colliding_batches", "dup_pairs_in_batch",
            "colliding_bp",
        )
        .orderBy("batch_size")
    )


# --- round-12 wave 3: q477 D4 prototypicality pruning ladder ------------------

#: drop fractions (percent) for the prototypicality prune.
_D4_GRID = (10, 25, 50)
_D4_K = 16  # centroid panel size (q456's kmax / q151 first-K rule)
_D4_BUCKET = 1000  # e6-distance bucket width for the threshold census

_DUCK_D4 = f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         c AS (
      SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_D4_K}),
         d AS (
      SELECT v.vec_id, v.label, c.cid,
             CAST(round(1000000 * list_aggregate(
               list_transform(generate_series(1, 64),
                 i -> (v.e[i] - c.ce[i]) * (v.e[i] - c.ce[i])), 'sum'))
               AS BIGINT) AS d2
      FROM v CROSS JOIN c),
         asn AS (
      SELECT vec_id, label, cid, d2 // {_D4_BUCKET} AS bucket FROM (
        SELECT vec_id, label, cid, d2, row_number() OVER (
                 PARTITION BY vec_id ORDER BY d2, cid) AS rk
        FROM d) WHERE rk = 1),
         c3 AS (
      SELECT cid, bucket, label, count(*) AS c
      FROM asn GROUP BY cid, bucket, label),
         cb AS (SELECT cid, bucket, sum(c) AS c FROM c3 GROUP BY cid, bucket),
         n AS (SELECT cid, sum(c) AS n FROM cb GROUP BY cid),
         cum AS (
      SELECT cid, bucket,
             sum(c) OVER (PARTITION BY cid ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM cb),
         g AS (SELECT unnest([{", ".join(str(x) for x in _D4_GRID)}])
                 AS p_pct),
         thr AS (
      SELECT g.p_pct, cum.cid, min(cum.bucket) AS thr_bucket
      FROM cum JOIN n USING (cid) CROSS JOIN g
      WHERE 100 * cum.cum >= g.p_pct * n.n
      GROUP BY g.p_pct, cum.cid)
    SELECT CAST(t.p_pct AS BIGINT) AS p_pct,
           CAST(c3.label AS BIGINT) AS label,
           CAST(sum(c3.c) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN c3.bucket <= t.thr_bucket THEN c3.c ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST((10000 * sum(CASE WHEN c3.bucket <= t.thr_bucket
                                  THEN c3.c ELSE 0 END)) // sum(c3.c)
                AS BIGINT) AS drop_bp
    FROM c3 JOIN thr t USING (cid)
    GROUP BY t.p_pct, c3.label
    ORDER BY p_pct, label
"""


@register("q477_prototypicality_prune", _DUCK_D4)
def q477_prototypicality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4-style PROTOTYPICALITY pruning ladder — the diversification
    half of Tirumala et al. (NeurIPS 2023): after SemDeDup removes
    semantic duplicates, D4 additionally drops the most PROTOTYPICAL
    points (smallest distance to their cluster centroid — Sorscher et
    al., NeurIPS 2022's SSL-prototypes rule) because they carry the
    least marginal information. For each drop fraction p in
    {_D4_GRID}%, every embedding is assigned to its nearest first-
    {_D4_K} centroid (the q151/q456 deterministic panel) and the
    per-cluster distance threshold that prunes the closest ~p% is
    derived from a BUCKETED distance census — the per-(p, label)
    drop census shows which declared domain the prune concentrates
    on (the mixture-shift question a D4 deployment must audit before
    training, cf. q164/q453).

    Determinism: distances are index-ordered e6-quantized folds (the
    q456 contract); the prune rule is bucket-exact — thr(cid, p) =
    smallest {_D4_BUCKET}-wide e6-distance bucket whose cumulative
    count reaches p% of the cluster, drop iff bucket <= thr — so both
    engines agree without ordering WITHIN a bucket (achieved drop_bp
    overshoots p by at most one bucket's mass, reported exactly).

    100 TB shape: ONE corpus pass computes all {_D4_K} distances
    in-row against the broadcast panel (no crossJoin expansion) and
    reduces to a (cid, bucket, label) census — every later stage
    (cumulative window PARTITIONED BY cid, threshold join, final
    census x threshold aggregate) rides censuses bounded by
    {_D4_K} x buckets x labels, never the corpus."""
    from ooh_etl_spark.tables import parallelize_rows

    emb = parallelize_rows(load_table(spark, sf_dir, "embeddings"))
    v = emb.select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    c = v.filter(F.col("vec_id") < _D4_K).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    cagg = c.agg(F.collect_list(F.struct("cid", "ce")).alias("cents"))
    asn = v.crossJoin(F.broadcast(cagg)).select(
        "label",
        F.expr(
            "array_min(transform(cents, c -> named_struct("
            " 'd2', CAST(round(1000000 * aggregate("
            "   zip_with(e, c.ce, (x, y) -> (x - y) * (x - y)),"
            "   CAST(0 AS DOUBLE), (a, t) -> a + t)) AS BIGINT),"
            " 'cid', c.cid)))"
        ).alias("a"),
    ).select(
        "label",
        F.col("a.cid").alias("cid"),
        F.expr(f"a.d2 div {_D4_BUCKET}").alias("bucket"),
    )
    c3 = (
        asn.groupBy("cid", "bucket", "label")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # <= K x buckets x labels rows; feeds the
        # threshold derivation AND the final census — without the cut
        # each branch would re-run the corpus assignment pass
    )
    cb = c3.groupBy("cid", "bucket").agg(F.sum("c").alias("c"))
    n = cb.groupBy("cid").agg(F.sum("c").alias("n"))
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("cid")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cb.select("cid", "bucket", F.sum("c").over(wcum).alias("cum"))
    grid = spark.createDataFrame([(p,) for p in _D4_GRID], "p_pct BIGINT")
    thr = (
        cum.join(F.broadcast(n), "cid")
        .crossJoin(F.broadcast(grid))
        .filter(100 * F.col("cum") >= F.col("p_pct") * F.col("n"))
        .groupBy("p_pct", "cid")
        .agg(F.min("bucket").alias("thr_bucket"))
    )
    return (
        c3.join(F.broadcast(thr), "cid")
        .groupBy("p_pct", "label")
        .agg(
            F.sum("c").cast("bigint").alias("n_vecs"),
            F.sum(
                F.when(F.col("bucket") <= F.col("thr_bucket"), F.col("c"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_dropped"),
            F.expr(
                "(10000 * sum(CASE WHEN bucket <= thr_bucket THEN c ELSE 0"
                " END)) div sum(c)"
            )
            .cast("bigint")
            .alias("drop_bp"),
        )
        .select(
            F.col("p_pct").cast("bigint").alias("p_pct"),
            F.col("label").cast("bigint").alias("label"),
            "n_vecs",
            "n_dropped",
            "drop_bp",
        )
        .orderBy("p_pct", "label")
    )
