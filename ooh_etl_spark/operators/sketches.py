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
- ``bloom_semi_join``: a driver-built Bloom filter over the (small)
  key side, broadcast as a cheap prefilter ahead of the exact
  semi-join — the hand-rolled form of Spark's runtime row-group
  filters; false positives are removed by the exact join, false
  negatives are impossible.
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


class PyBloom:
    """Minimal deterministic Bloom filter: double hashing (Kirsch &
    Mitzenmacher 2006) over blake2b-derived 64-bit hashes into a numpy
    bitmap. Deterministic across processes (no salted ``hash()``), so
    it survives the driver → Python-UDF-worker broadcast."""

    def __init__(self, n_items: int, bits_per_item: int = 10, n_hashes: int = 7):
        import numpy as np

        self.m = max(64, n_items * bits_per_item)
        self.h = n_hashes
        self.bits = np.zeros(self.m, dtype=bool)

    @staticmethod
    def _h2(v) -> tuple[int, int]:
        import hashlib

        d = hashlib.blake2b(str(v).encode(), digest_size=16).digest()
        return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")

    def add(self, v) -> None:
        a, b = self._h2(v)
        for i in range(self.h):
            self.bits[(a + i * b) % self.m] = True

    def might_contain(self, v) -> bool:
        a, b = self._h2(v)
        return all(self.bits[(a + i * b) % self.m] for i in range(self.h))


def bloom_semi_join(
    facts: DataFrame, fact_key: str, keys: DataFrame, key_col: str
) -> DataFrame:
    """Exact semi-join of ``facts`` against ``keys``, prefiltered by a
    Bloom filter built over the (small by design) key side. The filter
    prunes most non-matching fact rows before the join; the exact
    semi-join removes Bloom false positives; false negatives are
    impossible. At scale this is what Spark's runtime bloom-filter
    join (SPARK-32268) injects automatically when stats warrant — the
    broadcast is a compact bitmap (~10 bits/key), not the key set.
    PySpark exposes no DataFrame.stat.bloomFilter (Scala-only), hence
    the self-contained PyBloom."""
    key_values = [r[0] for r in keys.select(key_col).distinct().collect()]
    bloom = PyBloom(len(key_values))
    for v in key_values:
        bloom.add(v)
    bloom_bc = facts.sparkSession.sparkContext.broadcast(bloom)

    @F.udf("boolean")
    def might_contain(v) -> bool:
        return v is not None and bloom_bc.value.might_contain(v)

    prefiltered = facts.filter(might_contain(F.col(fact_key)))
    return prefiltered.join(
        F.broadcast(keys.select(F.col(key_col).alias(fact_key)).distinct()),
        fact_key,
        "left_semi",
    )
