"""A/B the net cost of localCheckpoint at bench scale (VERDICT r6 #5).

The round-6 repeated-pass audit added ~40 localCheckpoint sites; the
same round the common-set bench drifted +5-8%. Hypothesis: at sf0.1 a
checkpoint materialization can cost more than the recompute it saves
(the saved scan is a cheap parquet read; the checkpoint is a full
write+read of the intermediate through the block manager).

This tool times each headline query twice — stock, and with
DataFrame.localCheckpoint monkeypatched to identity (so multi-consumer
subtrees recompute instead of materializing) — and prints a per-query
delta table plus the count of checkpoint calls each query makes.
Queries that call no checkpoint act as noise controls.

Usage: python tools/checkpoint_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    # PySpark 4: the session returns pyspark.sql.classic.dataframe
    # instances, which OVERRIDE localCheckpoint — patching the
    # pyspark.sql.DataFrame base class silently does nothing (first
    # A/B attempt measured pure noise that way; the sites counter
    # staying 0 on known-checkpointed queries was the tell).
    from pyspark.sql.classic.dataframe import DataFrame

    import bench
    from ooh_etl_spark.queries import get_queries
    from ooh_etl_spark.session import get_spark

    spark = get_spark("checkpoint_ab")
    qs = get_queries()

    real_ckpt = DataFrame.localCheckpoint
    calls = {"n": 0}

    def counting_ckpt(self, eager=True):
        calls["n"] += 1
        return real_ckpt(self, eager)

    def noop_ckpt(self, eager=True):
        calls["n"] += 1
        return self

    # Warm codegen/readers at the smallest SF.
    spark.range(1).count()
    for name in bench.HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").count()

    results = {}
    for name in bench.HEADLINE:
        # Interleave C,N,C,N,... so page-cache/JIT drift hits both arms
        # equally (arm-ordered runs biased the second arm ~-10% on
        # zero-site control queries in the first attempt).
        row = {}
        runs = {"ckpt": [], "noop": []}
        try:
            for _ in range(reps):
                for label, patch in (("ckpt", counting_ckpt), ("noop", noop_ckpt)):
                    DataFrame.localCheckpoint = patch
                    calls["n"] = 0
                    try:
                        t0 = time.perf_counter()
                        qs[name](spark, sf_dir).toPandas()
                        runs[label].append(time.perf_counter() - t0)
                        row[f"{label}_calls"] = calls["n"]
                    finally:
                        DataFrame.localCheckpoint = real_ckpt
            for label in ("ckpt", "noop"):
                row[label] = round(median(runs[label]), 3)
        except Exception as e:  # noqa: BLE001 — noop can break iterative lineage
            row.setdefault("ckpt", None)
            row["noop"] = None
            row["err"] = str(e)[:80]
        if row.get("ckpt") and row.get("noop"):
            row["delta_pct"] = round(100 * (row["noop"] - row["ckpt"]) / row["ckpt"], 1)
        results[name] = row
        print(
            f"{name}: ckpt={row.get('ckpt')}s noop={row.get('noop')}s "
            f"delta={row.get('delta_pct', 'n/a')}% sites={row.get('ckpt_calls', 0)}",
            flush=True,
        )

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "CKPT_AB.json")
    with open(os.path.abspath(out), "w") as f:
        json.dump({"sf_dir": sf_dir, "reps": reps, "results": results}, f, indent=1)
    print(f"# wrote {os.path.abspath(out)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
