"""Interleaved A/B for the r13 quality_ops optimizations (guide §1).

Old arms are the pre-change pipeline bodies (copied from git HEAD at
the time of the change) rebuilt from the SAME module helpers; new arms
call the live functions. Arms alternate rep-by-rep inside ONE Spark
session so both see identical box noise; each rep times the full
construction + noop materialization (guide §1.4).

Usage: python tools/ab_r13_quality.py [reps] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ooh_etl_spark.operators.dedup import exact_dedup, jaccard_pairs
from ooh_etl_spark.queries.quality_ops import (
    _AGREE_STOPWORDS,
    _BENCH_MOD,
    _BFS_GRID,
    _BLOOM_K,
    _BLOOM_M,
    _FUN_K,
    _FUN_M,
    _MIN_SHARED,
    _docs,
    _trigrams,
    q444_bloom_decontaminate,
    q475_bloom_sizing_advisor,
    q479_corpus_build_funnel,
)
from ooh_etl_spark.functions.text import tokenize
from ooh_etl_spark.session import get_spark


def old_q444(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = tokenize(F.col("text"))
    g = docs.select(
        "doc_id", "source", F.explode_outer(_trigrams(toks)).alias("gram")
    ).filter(F.col("gram").isNotNull())

    def pos(j):
        return F.expr(
            f"CAST(conv(substring(h, {1 + 8 * j}, 8), 16, 10)"
            f" AS BIGINT) % {_BLOOM_M}"
        )

    bench = (
        g.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("gram")
        .distinct()
        .localCheckpoint()
    )
    bits = (
        bench.withColumn("h", F.md5("gram"))
        .select(
            F.explode(F.array(*[pos(j) for j in range(_BLOOM_K)])).alias("pos")
        )
        .distinct()
        .withColumn("bit_set", F.lit(1))
    )  # NO checkpoint: each probe join rebuilds this subtree
    corpus = g.filter(F.col("doc_id") % _BENCH_MOD != 0)
    probed = corpus.withColumn("h", F.md5("gram"))
    for j in range(_BLOOM_K):
        probed = probed.withColumn(f"p{j}", pos(j))
    probed = probed.drop("h")
    for j in range(_BLOOM_K):
        probed = probed.join(
            F.broadcast(
                bits.select(
                    F.col("pos").alias(f"p{j}"), F.col("bit_set").alias(f"b{j}")
                )
            ),
            f"p{j}",
            "left",
        )
    bloom_hit = F.expr(
        " AND ".join(f"b{j} IS NOT NULL" for j in range(_BLOOM_K))
    )
    exact = bench.withColumn("exact_set", F.lit(1))
    per_doc = (
        probed.join(F.broadcast(exact), "gram", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(bloom_hit.cast("int")).alias("n_bloom"),
            F.sum(F.col("exact_set").isNotNull().cast("int")).alias("n_exact"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("n_bloom") >= _MIN_SHARED).cast("int"))
            .cast("bigint")
            .alias("n_flagged_bloom"),
            F.sum((F.col("n_exact") >= _MIN_SHARED).cast("int"))
            .cast("bigint")
            .alias("n_flagged_exact"),
            F.sum(
                (
                    (F.col("n_bloom") >= _MIN_SHARED)
                    & (F.col("n_exact") < _MIN_SHARED)
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_false_positive"),
        )
        .orderBy("source")
    )


def old_q475(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = tokenize(F.col("text"))
    g = docs.select(
        "doc_id", F.explode_outer(_trigrams(toks)).alias("gram")
    ).filter(F.col("gram").isNotNull())
    bench = (
        g.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("gram")
        .distinct()
        .localCheckpoint()
    )
    nins = bench.agg(F.count(F.lit(1)).alias("n_ins"))
    grid = spark.createDataFrame(
        list(_BFS_GRID), "m_bits BIGINT, k_hashes BIGINT"
    )
    pos = F.expr(
        "CAST(conv(substring(h, CAST(1 + 8 * j AS INT), 8), 16, 10)"
        " AS BIGINT) % m_bits"
    )
    bits = (
        bench.withColumn("h", F.md5("gram"))
        .crossJoin(F.broadcast(grid))
        .select(
            "m_bits",
            "k_hashes",
            F.explode(F.sequence(F.lit(0), F.col("k_hashes") - 1)).alias("j"),
            "h",
        )
        .select("m_bits", "k_hashes", pos.alias("pos"))
        .distinct()
        .withColumn("bit_set", F.lit(1))
    )
    absent = (
        g.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .select("gram")
        .distinct()
        .join(
            F.broadcast(bench.withColumn("in_bench", F.lit(1))), "gram", "left"
        )
        .filter(F.col("in_bench").isNull())
        .select("gram")
    )
    probes = (
        absent.withColumn("h", F.md5("gram"))
        .crossJoin(F.broadcast(grid))
        .select(
            "m_bits",
            "k_hashes",
            F.explode(F.sequence(F.lit(0), F.col("k_hashes") - 1)).alias("j"),
            "gram",
            "h",
        )
        .select("m_bits", "k_hashes", "gram", pos.alias("pos"))
    )
    per_gram = (
        probes.join(F.broadcast(bits), ["m_bits", "k_hashes", "pos"], "left")
        .groupBy("m_bits", "k_hashes", "gram")
        .agg(F.min(F.col("bit_set").isNotNull().cast("int")).alias("maybe"))
    )
    return (
        per_gram.groupBy("m_bits", "k_hashes")
        .agg(
            F.count(F.lit(1)).alias("n_absent_raw"),
            F.sum("maybe").alias("n_fp_raw"),
        )
        .crossJoin(F.broadcast(nins))
        .select(
            F.col("m_bits").cast("bigint").alias("m_bits"),
            F.col("k_hashes").cast("bigint").alias("k_hashes"),
            F.col("n_ins").cast("bigint").alias("n_inserted"),
            F.col("n_absent_raw").cast("bigint").alias("n_absent"),
            F.col("n_fp_raw").cast("bigint").alias("n_false_pos"),
            F.expr("(10000 * n_fp_raw) div n_absent_raw")
            .cast("bigint")
            .alias("fpr_bp"),
            F.round(
                10000
                * F.pow(
                    1.0
                    - F.exp(
                        -F.col("k_hashes").cast("double")
                        * F.col("n_ins")
                        / F.col("m_bits")
                    ),
                    F.col("k_hashes").cast("double"),
                )
            )
            .cast("bigint")
            .alias("theory_bp"),
            F.expr("(1000 * m_bits) div greatest(n_ins, 1)")
            .cast("bigint")
            .alias("bits_per_key_milli"),
        )
        .orderBy("m_bits", "k_hashes")
    )


# Intentionally FROZEN with the old-arm body (ADVICE r13 item 2):
# the old arm must reproduce the r13-close pipeline byte-for-byte
# even if quality_ops later changes its constant. quality_ops'
# live value is imported by tools/ab_r14.py instead.
_FUN_PACK_L = 128


def old_q479(spark, sf_dir):
    d0 = _docs(spark, sf_dir).select(
        "doc_id", "source", "text", tokenize(F.col("text")).alias("toks")
    )
    bench = (
        d0.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode_outer(_trigrams(F.col("toks"))).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()
        .localCheckpoint()
    )

    def pos(j):
        return F.expr(
            f"CAST(conv(substring(h, {1 + 8 * j}, 8), 16, 10)"
            f" AS BIGINT) % {_FUN_M}"
        )

    bits = (
        bench.withColumn("h", F.md5("gram"))
        .select(
            F.explode(F.array(*[pos(j) for j in range(_FUN_K)])).alias("pos")
        )
        .distinct()
        .withColumn("bit_set", F.lit(1))
    )
    raw = d0.filter(F.col("doc_id") % _BENCH_MOD != 0)
    sw = ", ".join(f"'{w}'" for w in _AGREE_STOPWORDS)
    feat = raw.select(
        "doc_id",
        "source",
        "text",
        "toks",
        F.size("toks").alias("n_toks"),
        F.size(
            F.array_remove(F.array_distinct(F.split(F.col("text"), "")), "")
        ).alias("n_alpha"),
        F.expr(f"size(filter(toks, t -> t IN ({sw})))").alias("n_stop"),
        F.expr(
            "aggregate(array_sort(toks),"
            " named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),"
            " (acc, t) -> named_struct("
            "   'prev', t,"
            "   'run', CASE WHEN acc.prev IS NOT NULL AND acc.prev = t"
            "               THEN acc.run + 1 ELSE 1 END,"
            "   'best', greatest(acc.best,"
            "     CASE WHEN acc.prev IS NOT NULL AND acc.prev = t"
            "          THEN acc.run + 1 ELSE 1 END)),"
            " acc -> acc.best)"
        ).alias("top_tok"),
    )
    q = (
        feat.filter(
            (F.col("n_toks") >= 20)
            & (F.col("n_alpha") >= 12)
            & (F.expr("(10000 * n_stop) div n_toks") >= 100)
            & (F.expr("(10000 * top_tok) div n_toks") <= 2000)
        )
        .select("doc_id", "source", "text", "toks")
        .localCheckpoint()
    )
    exd = exact_dedup(q, key="text", id_col="doc_id").localCheckpoint()
    dropped = (
        jaccard_pairs(exd, "text", "doc_id", n=3, threshold=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    nd = exd.join(dropped, "doc_id", "left_anti").localCheckpoint()
    cg = nd.select(
        "doc_id", F.explode_outer(_trigrams(F.col("toks"))).alias("gram")
    ).filter(F.col("gram").isNotNull())
    probed = cg.withColumn("h", F.md5("gram"))
    for j in range(_FUN_K):
        probed = probed.withColumn(f"p{j}", pos(j)).join(
            F.broadcast(
                bits.select(
                    F.col("pos").alias(f"p{j}"), F.col("bit_set").alias(f"b{j}")
                )
            ),
            f"p{j}",
            "left",
        )
    flagged = (
        probed.filter(
            F.expr(" AND ".join(f"b{j} IS NOT NULL" for j in range(_FUN_K)))
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") >= _MIN_SHARED)
        .select("doc_id")
    )
    fin = nd.join(flagged, "doc_id", "left_anti").localCheckpoint()

    def census(df):
        return df.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("toks")).cast("bigint").alias("tk"),
        )

    rawc = census(raw).localCheckpoint()
    srcs = rawc.select("source", F.col("n").alias("n_raw"))

    def stage_row(stage, name, c):
        return (
            srcs.join(F.broadcast(c), "source", "left")
            .select(
                F.lit(stage).cast("bigint").alias("stage"),
                F.lit(name).alias("stage_name"),
                "source",
                F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_docs"),
                F.coalesce(F.col("tk"), F.lit(0))
                .cast("bigint")
                .alias("n_tokens"),
                F.expr("(10000 * coalesce(n, 0)) div n_raw")
                .cast("bigint")
                .alias("metric_bp"),
            )
        )

    finc = census(fin).localCheckpoint()
    st = (
        fin.select("source", F.explode("toks").alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    tk2 = st.groupBy("term").agg(F.sum("m").alias("c"))
    ntot = tk2.agg(F.sum("c").alias("n"))
    u = tk2.crossJoin(F.broadcast(ntot)).select(
        "term",
        F.expr("CAST(round(1000000 * ln((1.0 * n) / c)) AS BIGINT)").alias(
            "u_micro"
        ),
    )
    srcx = (
        st.join(u, "term")
        .groupBy("source")
        .agg(
            F.sum("m").cast("bigint").alias("toks_m"),
            F.expr("sum(m * u_micro) div sum(m)")
            .cast("bigint")
            .alias("xent_micro"),
            F.sum(F.expr("m * u_micro")).alias("wsum"),
        )
        .localCheckpoint()
    )
    tot = srcx.agg(
        F.sum("wsum").alias("wsum_all"), F.sum("toks_m").alias("toks_all")
    )
    wmix = (
        srcx.crossJoin(F.broadcast(tot))
        .withColumn(
            "excess_micro",
            F.col("xent_micro")
            - F.expr("wsum_all div toks_all").cast("bigint"),
        )
        .withColumn(
            "f_e9",
            F.expr(
                "CAST(round(1000000000 * exp(0.5 * excess_micro / 1000000.0))"
                " AS BIGINT)"
            ),
        )
    )
    den = wmix.agg(
        F.expr("sum(CAST(toks_m AS DECIMAL(38,0)) * f_e9)").alias("den_new")
    )
    wnorm = wmix.crossJoin(F.broadcast(den)).select(
        "source",
        F.expr(
            "CAST((10000 * CAST(toks_m AS DECIMAL(38,0)) * f_e9)"
            " div den_new AS BIGINT)"
        ).alias("w_new_bp"),
    )
    mix_row = (
        srcs.join(F.broadcast(finc), "source", "left")
        .join(F.broadcast(wnorm), "source", "left")
        .select(
            F.lit(5).cast("bigint").alias("stage"),
            F.lit("mixture").alias("stage_name"),
            "source",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce(F.col("tk"), F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("w_new_bp"), F.lit(0))
            .cast("bigint")
            .alias("metric_bp"),
        )
    )
    pad = F.expr(
        f"((n + {_FUN_PACK_L - 1}) div {_FUN_PACK_L}) * {_FUN_PACK_L} - n"
    )
    pk = (
        fin.select("source", F.size("toks").alias("n"))
        .select("source", "n", pad.alias("pad"))
        .groupBy("source")
        .agg(
            F.expr("(10000 * sum(pad)) div (sum(n) + sum(pad))")
            .cast("bigint")
            .alias("pad_bp")
        )
    )
    pack_row = (
        srcs.join(F.broadcast(finc), "source", "left")
        .join(F.broadcast(pk), "source", "left")
        .select(
            F.lit(6).cast("bigint").alias("stage"),
            F.lit("packing").alias("stage_name"),
            "source",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce(F.col("tk"), F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("pad_bp"), F.lit(0))
            .cast("bigint")
            .alias("metric_bp"),
        )
    )
    return (
        stage_row(0, "raw", rawc)
        .unionByName(stage_row(1, "quality", census(q)))
        .unionByName(stage_row(2, "exact_dedup", census(exd)))
        .unionByName(stage_row(3, "neardup", census(nd)))
        .unionByName(stage_row(4, "decontam", finc))
        .unionByName(mix_row)
        .unionByName(pack_row)
        .orderBy("stage", "source")
    )


ARMS = {
    "q444": (old_q444, q444_bloom_decontaminate),
    "q475": (old_q475, q475_bloom_sizing_advisor),
    "q479": (old_q479, q479_corpus_build_funnel),
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 7
    names = [a for a in args if not a.isdigit()] or list(ARMS)
    spark = get_spark("ab_r13_quality")
    for name in names:
        old_fn, new_fn = ARMS[name]
        # warm both arms once (untimed)
        for fn in (old_fn, new_fn):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        # sanity: identical output hash
        a = old_fn(spark, sf_dir).toPandas()
        b = new_fn(spark, sf_dir).toPandas()
        same = a.equals(b)
        olds, news = [], []
        for r in range(reps):
            for label, fn, acc in (
                ("old", old_fn, olds),
                ("new", new_fn, news),
            ):
                spark.sparkContext.setJobDescription(f"{name}:{label}:rep{r}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                acc.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        import statistics

        med = statistics.median  # ADVICE r13 item 3: unbiased for even reps
        print(
            f"{name}: rows_equal={same} old med {med(olds):.3f}s min"
            f" {min(olds):.3f}s | new med {med(news):.3f}s min"
            f" {min(news):.3f}s | reps={reps}"
        )
        print(f"  old: {[round(x,3) for x in olds]}")
        print(f"  new: {[round(x,3) for x in news]}")


if __name__ == "__main__":
    main()
