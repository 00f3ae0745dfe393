"""Interleaved A/B for the r14 optimizations (guide §1).

Old arms are the pre-change pipeline bodies frozen from the r13 close
(git a62edc0), rebuilt from the SAME module helpers; new arms call the
live functions. Arms alternate rep-by-rep inside ONE Spark session so
both see identical box noise; each rep times the full construction +
noop materialization (guide §1.4). rows_equal compares toPandas frames.

Usage: python tools/ab_r14.py [reps] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ooh_etl_spark.operators.dedup import exact_dedup, jaccard_pairs
from ooh_etl_spark.functions.text import tokenize
from ooh_etl_spark.queries.bi_ops import q373_price_indices
from ooh_etl_spark.queries.linkage_ops import q296_symspell_edit_join
from ooh_etl_spark.queries.quality_ops import (
    _AGREE_STOPWORDS,
    _BENCH_MOD,
    _FUN_K,
    _FUN_M,
    _FUN_PACK_L,
    _MIN_SHARED,
    _docs,
    _trigrams,
    q479_corpus_build_funnel,
)
from ooh_etl_spark.queries.pipeline_ops import q433_dsir_importance
from ooh_etl_spark.session import get_spark
from ooh_etl_spark.tables import load_table


def old_q373(spark, sf_dir):
    """r13 body: eager (pk, month) checkpoint + two broadcast joins."""
    li = load_table(spark, sf_dir, "lineitem")
    pm = (
        li.groupBy(
            F.col("l_partkey").alias("pk"),
            (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("mo"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("spend_c"),
            F.sum(F.round(F.col("l_quantity")).cast("bigint"))
            .cast("bigint")
            .alias("qty"),
        )
        .localCheckpoint()
    )
    base_mo = pm.agg(F.min("mo").alias("mo0"))
    base = (
        pm.join(F.broadcast(base_mo), pm["mo"] == base_mo["mo0"])
        .select(
            "pk",
            (F.col("spend_c") * 1.0 / F.col("qty")).alias("p0"),
            F.col("qty").alias("q0"),
        )
    )
    cur = pm.join(F.broadcast(base), "pk").select(
        "mo",
        (F.col("spend_c") * 1.0 / F.col("qty")).alias("pt"),
        F.col("qty").alias("qt"),
        "p0",
        "q0",
    )
    terms = cur.select(
        "mo",
        F.round(100.0 * F.col("pt") * F.col("q0")).cast("bigint").alias("ptq0_cc"),
        F.round(100.0 * F.col("p0") * F.col("q0")).cast("bigint").alias("p0q0_cc"),
        F.round(100.0 * F.col("pt") * F.col("qt")).cast("bigint").alias("ptqt_cc"),
        F.round(100.0 * F.col("p0") * F.col("qt")).cast("bigint").alias("p0qt_cc"),
    )
    idx = terms.groupBy("mo").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        (F.sum("ptq0_cc") * 1.0 / F.sum("p0q0_cc")).alias("lasp"),
        (F.sum("ptqt_cc") * 1.0 / F.sum("p0qt_cc")).alias("paas"),
    )
    return idx.select(
        F.format_string(
            "%04d-%02d", F.expr("mo div 100"), F.expr("mo % 100")
        ).alias("month"),
        "n_parts",
        F.round(1000000.0 * F.col("lasp")).cast("bigint").alias("laspeyres_e6"),
        F.round(1000000.0 * F.col("paas")).cast("bigint").alias("paasche_e6"),
        F.round(1000000.0 * F.sqrt(F.col("lasp") * F.col("paas")))
        .cast("bigint")
        .alias("fisher_e6"),
    ).orderBy("month")


def old_q296(spark, sf_dir):
    """r13 body: xxhash64 posting keys + global pair DISTINCT."""
    cust = load_table(spark, sf_dir, "customer")
    members = (
        cust.select(
            F.col("c_name").alias("name"),
            F.explode(
                F.expr(
                    "array_append(transform(sequence(1, length(c_name)), "
                    "i -> concat(substr(c_name, 1, i - 1), "
                    "substr(c_name, i + 1, length(c_name)))), c_name)"
                )
            ).alias("variant"),
        )
        .groupBy(F.xxhash64("variant").alias("vkey"))
        .agg(F.array_sort(F.collect_set("name")).alias("names"))
        .filter(F.size("names") >= 2)
    )
    pairs = (
        members.select("names", F.posexplode("names").alias("i", "na"))
        .select("na", F.expr("slice(names, i + 2, size(names))").alias("tail"))
        .select("na", F.explode_outer("tail").alias("nb"))
        .filter(F.col("nb").isNotNull())
        .filter(F.levenshtein("na", "nb") <= 1)
        .distinct()
    )
    neigh = (
        pairs.select(F.explode(F.array("na", "nb")).alias("name"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
    )
    return (
        neigh.groupBy(F.col("n_neighbors").cast("bigint").alias("n_neighbors"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_names"))
        .orderBy("n_neighbors")
    )


def old_q479(spark, sf_dir):
    from ooh_etl_spark.operators.dedup import exact_dedup, jaccard_pairs

    d0 = _docs(spark, sf_dir).select(
        "doc_id", "source", "text", tokenize(F.col("text")).alias("toks")
    )
    bench_plan = (
        d0.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode_outer(_trigrams(F.col("toks"))).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()
    )

    # ONE md5 per gram row, k slice-probes off it (r13 opt — the q444
    # treatment; each position previously recomputed md5(gram)).
    def pos(j: int) -> Column:
        return F.expr(
            f"CAST(conv(substring(h, {1 + 8 * j}, 8), 16, 10)"
            f" AS BIGINT) % {_FUN_M}"
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
        # q465's sorted-run fold, on the already-materialized toks
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
    q_plan = feat.filter(
        (F.col("n_toks") >= 20)
        & (F.col("n_alpha") >= 12)
        & (F.expr("(10000 * n_stop) div n_toks") >= 100)
        & (F.expr("(10000 * top_tok) div n_toks") <= 2000)
    ).select("doc_id", "source", "text", "toks")

    def census(df: DataFrame) -> DataFrame:
        return df.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("toks")).cast("bigint").alias("tk"),
        )

    # r13 opt (guide §2.6 "overlap independent jobs"): the three
    # stage-0 materializations — the bench gram set (bit-build side),
    # the quality-gate survivors (stage-1 boundary), and the raw
    # source census (reused by every stage row) — share no lineage
    # below the scan, so their eager localCheckpoints run as
    # concurrent jobs instead of three sequential job launches. On a
    # cluster the later jobs' tasks back-fill executors left idle by
    # the earlier jobs' stage tails; plans and results are unchanged
    # (each checkpoint materializes the same frame it did serially).
    # The bench gram set has exactly ONE consumer (the bit build), so
    # the cut sits at `bits` itself — one checkpoint job materializes
    # the whole bench->positions subtree, and both probe-join
    # broadcasts below build from the tiny checkpointed RDD instead of
    # re-running the distinct (the q444 plan-audit lesson).
    bits_plan = (
        bench_plan.withColumn("h", F.md5("gram"))
        .select(
            F.explode(F.array(*[pos(j) for j in range(_FUN_K)])).alias("pos")
        )
        .distinct()
        .withColumn("bit_set", F.lit(1))
    )
    with ThreadPoolExecutor(max_workers=3) as pool:
        f_bits = pool.submit(lambda: bits_plan.localCheckpoint())
        f_q = pool.submit(lambda: q_plan.localCheckpoint())
        f_rawc = pool.submit(lambda: census(raw).localCheckpoint())
        bits = f_bits.result()  # decontam filter, broadcast twice
        q = f_q.result()  # stage boundary: feeds dedup AND the census
        rawc = f_rawc.result()  # |sources| rows, reused 6x

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

    srcs = rawc.select("source", F.col("n").alias("n_raw"))

    def stage_row(stage: int, name: str, c: DataFrame) -> DataFrame:
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

    # stage 5: one DoReMi multiplicative-weights step (q453 contract)
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
    srcx_plan = (
        st.join(u, "term")
        .groupBy("source")
        .agg(
            F.sum("m").cast("bigint").alias("toks_m"),
            F.expr("sum(m * u_micro) div sum(m)")
            .cast("bigint")
            .alias("xent_micro"),
            F.sum(F.expr("m * u_micro")).alias("wsum"),
        )
    )
    # Same §2.6 overlap as the stage-0 block: the decontam census and
    # the DoReMi source-model frame both hang off the checkpointed
    # `fin` and feed disjoint output rows — materialize concurrently.
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_finc = pool.submit(lambda: census(fin).localCheckpoint())
        f_srcx = pool.submit(lambda: srcx_plan.localCheckpoint())
        finc = f_finc.result()  # feeds stages 4, 5 and 6
        srcx = f_srcx.result()  # |sources| rows feed the scalar + weights
    tot = srcx.agg(
        F.sum("wsum").alias("wsum_all"), F.sum("toks_m").alias("toks_all")
    )
    wmix = (
        srcx.crossJoin(F.broadcast(tot))
        .withColumn(
            "excess_micro",
            F.col("xent_micro") - F.expr("wsum_all div toks_all").cast("bigint"),
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

    # stage 6: q445 pad-to-boundary waste on the final corpus
    pad = (
        F.expr(
            f"((n + {_FUN_PACK_L - 1}) div {_FUN_PACK_L}) * {_FUN_PACK_L} - n"
        )
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

def old_q433(spark, sf_dir):
    """r13 body: HOF transform(sequence) bigram array + explode."""
    from ooh_etl_spark.queries.pipeline_ops import _DSIR_B, _DSIR_TARGET, _DSIR_TOP

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    d = docs.select("doc_id", "source", toks.alias("toks"))
    bg = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1),"
            " i -> concat(toks[i-1], ' ', toks[i]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    dbc = (
        d.select(
            "doc_id",
            "source",
            F.explode_outer(bg).alias("bg"),
        )
        .filter(F.col("bg").isNotNull())
        .select(
            "doc_id",
            "source",
            (
                F.conv(F.substring(F.md5("bg"), 1, 8), 16, 10).cast("bigint")
                % _DSIR_B
            ).alias("bucket"),
        )
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    stats = dbc.groupBy("bucket").agg(
        F.sum("cnt").alias("c_all"),
        F.sum(
            F.when(F.col("source").isin(*_DSIR_TARGET), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("c_tgt"),
    )
    tot = stats.agg(
        F.sum("c_all").alias("n_all"), F.sum("c_tgt").alias("n_tgt")
    )
    w = stats.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            1_000_000
            * F.log(
                ((F.col("c_tgt") + 1.0) / (F.col("n_tgt") + _DSIR_B))
                / ((F.col("c_all") + 1.0) / (F.col("n_all") + _DSIR_B))
            )
        )
        .cast("bigint")
        .alias("term_micro"),
    )
    return (
        dbc.join(F.broadcast(w), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("term_micro"))
            .cast("bigint")
            .alias("logratio_micro"),
        )
        .orderBy(F.desc("logratio_micro"), "doc_id")
        .limit(_DSIR_TOP)
    )


ARMS = {
    "q373": (old_q373, q373_price_indices),
    "q296": (old_q296, q296_symspell_edit_join),
    "q479": (old_q479, q479_corpus_build_funnel),
    "q433": (old_q433, q433_dsir_importance),
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 7
    names = [a for a in args if not a.isdigit()] or list(ARMS)
    spark = get_spark("ab_r14")
    for name in names:
        old_fn, new_fn = ARMS[name]
        for fn in (old_fn, new_fn):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
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
        med = statistics.median
        print(
            f"{name}: rows_equal={same} old med {med(olds):.3f}s min"
            f" {min(olds):.3f}s | new med {med(news):.3f}s min"
            f" {min(news):.3f}s | reps={reps}",
            flush=True,
        )
        print(f"  old: {[round(x, 3) for x in olds]}", flush=True)
        print(f"  new: {[round(x, 3) for x in news]}", flush=True)


if __name__ == "__main__":
    main()
