"""Benchmark harness (driver contract: one JSON line to stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ...}

Each query is timed to full materialization (collect), which includes
scan, shuffle, and result transfer — the end-to-end number a user sees.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_doc_scan",
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_regional_revenue",
    "q13_asof_event_order",
    "q16_top3_orders_per_customer",
    "q21_word_counts",
    "q22_tfidf_top_term",
    "q26_exact_dedup",
    "q27_jaccard_pairs",
    "q30_knn_cosine",
    "q33_tumbling_hourly",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ooh_etl_spark.queries import get_queries
    from ooh_etl_spark.session import get_spark

    spark = get_spark("bench")
    qs = get_queries()

    # Warm the JVM, codegen cache, and parquet readers: run each
    # headline query once at the smallest SF so the timed runs measure
    # steady-state query execution, not first-use JIT/codegen compile.
    spark.range(1).count()
    for name in HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        n = len(qs[name](spark, sf_dir).collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
