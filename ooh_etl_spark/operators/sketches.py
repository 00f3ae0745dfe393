"""Sketch-accelerated EXACT operators.

Both operators here use a sketch as a PRUNING device and a second exact
pass for the answer, so results are bit-identical to the naive plan —
the sketch only bounds memory/shuffle:

- ``mg_candidates``: per-partition Misra-Gries summaries (bounded to k
  counters regardless of partition size) whose union provably contains
  every item with global frequency > n/k (each partition's MG keeps any
  local-frequency > local_n/k item; a global heavy hitter must exceed
  the threshold in at least one partition). The exact counting pass
  then runs only over this candidate set.
- ``bloom_semi_join``: an exact broadcast left-semi join — the
  broadcast hash set is the prefilter (codegen-probed, no driver
  collect); Spark's runtime bloom injection (SPARK-32268) takes over
  opportunistically if the plan ever degrades to a shuffle join.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_merge(count_batches, k: int) -> "pd.Series":
    """Mergeable-summary form of MG (Agarwal et al., PODS'12): exact
    value_counts per batch (vectorized), merged into the running
    summary, then compressed back to <= k counters by subtracting the
    (k+1)-th largest weight — same guarantee (any value with total
    count > n/k survives; total undercount <= n/k) as item-at-a-time
    MG, ~100x faster in Python. Property-tested in
    tests/test_properties.py."""
    counters = pd.Series(dtype="int64")
    for vc in count_batches:
        counters = counters.add(vc, fill_value=0)
        if len(counters) > k:
            kth = counters.nlargest(k + 1).iloc[-1]
            counters = counters[counters > kth] - kth
    return counters


def mg_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Misra-Gries candidate heavy hitters: one column of ``items``
    summarized per partition with at most ``k`` counters, unioned.
    Guarantee: contains every value with global count > total/k.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = mg_merge((pdf[col].dropna().value_counts() for pdf in batches), k)
        yield pd.DataFrame({col: counts.index.astype(str)})

    return items.select(col).mapInPandas(summarize, f"{col} string").distinct()


def exact_heavy_hitters(items: DataFrame, col: str, k: int) -> DataFrame:
    """Values of ``col`` with frequency > n/k, exactly. Pass 1 finds
    MG candidates (bounded state); pass 2 exact-counts ONLY candidates
    (broadcast semi-join before the shuffle) and applies the global
    threshold. Returns (value, cnt)."""
    cand = mg_candidates(items, col, k)
    total = items.select(F.count(col).alias("n"))
    counted = (
        items.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n"))
        .select(F.col(col).alias("value"), "cnt")
    )


def bloom_semi_join(
    facts: DataFrame, fact_key: str, keys: DataFrame, key_col: str
) -> DataFrame:
    """Exact semi-join of ``facts`` against ``keys``, with all pruning
    kept JVM-side. THE DESIGN IS THE BROADCAST HASH LEFT-SEMI JOIN
    itself: the broadcast hash set plays the "bloom filter" role with
    zero false positives, probed inside whole-stage codegen, and the
    fact side never shuffles. Spark's runtime bloom-filter injection
    (SPARK-32268, ``runtime.bloomFilter.enabled`` set in session.py) is
    strictly OPPORTUNISTIC here — ``InjectRuntimeFilter`` only plants a
    bloom filter when the application side has a shuffle to hide it in,
    so under this broadcast plan none is expected. The injected-bloom
    path becomes the relevant mechanism only when the key side outgrows
    the broadcast threshold and the planner falls back to a shuffle
    join — at which point it fires on Spark's own cost model, still
    executor-built and codegen-evaluated.

    Earlier revisions built a driver-side Python bloom filter
    (``.collect()`` of the key set) and applied it with a row-at-a-time
    Python UDF over every fact row; at 100 TB that is unbounded driver
    memory plus a serialized per-row Python hop — strictly worse than
    no prefilter, so it was removed (plan-asserted: q121 contains no
    ``BatchEvalPython``, tests/test_plans.py)."""
    dedup_keys = keys.select(F.col(key_col).alias(fact_key)).distinct()
    return facts.join(F.broadcast(dedup_keys), fact_key, "left_semi")
