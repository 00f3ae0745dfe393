"""Per-query measurement harness for the optimization rounds (guide §1).

For each named query (default: the bench HEADLINE list) this times, at
$SPARK_GRAFT_SF_DIR (default sf0.1):

- ``toPandas`` reps — the bench methodology, so numbers here are
  directly comparable to bench.py medians; and
- ``noop``-sink reps (guide §1.4) — full materialization of every
  column with no driver transfer, isolating the computation.

and (with ``--plans TAG``) writes ``plans/r13/<query>_<TAG>.txt`` with
the ``explain("formatted")`` output plus a one-line plan-shape summary
(Exchange count, join strategies, Python-eval nodes) so plan claims in
OPTIMIZATION_r13.md are checkable.

Usage:
  python tools/opt_measure.py [--reps N] [--plans before|after] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_summary(plan: str) -> str:
    ex = len(
        re.findall(
            r"Arguments: (?:hashpartitioning|rangepartitioning|"
            r"RoundRobinPartitioning)\(",
            plan,
        )
    )
    joins = sorted(
        set(
            re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)",
                plan,
            )
        )
    )
    py = sorted(
        set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", plan))
    )
    scans = plan.count("Scan parquet")
    return (
        f"shuffle_exchanges={ex} parquet_scans={scans} "
        f"joins={joins or '[]'} python_nodes={py or '[]'}"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    reps = 5
    plans_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--plans":
            plans_tag = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    from bench import HEADLINE

    from ooh_etl_spark.plans.audit import physical_plan
    from ooh_etl_spark.queries import get_queries
    from ooh_etl_spark.session import get_spark

    if not names:
        names = list(HEADLINE)
    qs = get_queries()
    spark = get_spark("opt_measure")
    spark.range(1).count()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    if plans_tag:
        os.makedirs(plans_dir, exist_ok=True)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if plans_tag:
            plan = physical_plan(fn(spark, sf_dir))
            path = os.path.join(plans_dir, f"{name}_{plans_tag}.txt")
            with open(path, "w") as f:
                f.write(f"# {name} @ {sf_dir} — {plan_summary(plan)}\n\n")
                f.write(plan)
        if reps == 0:
            print(f"{name}: plan dumped", flush=True)
            continue
        # warm: compile at smallest sf, then one untimed run at sf_dir
        fn(spark, "/root/testdata/sf0.001").count()
        fn(spark, sf_dir).count()
        tp, nj = [], []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: toPandas rep")
            t0 = time.perf_counter()
            n_rows = len(fn(spark, sf_dir).toPandas())
            tp.append(time.perf_counter() - t0)
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: noop rep")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            nj.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "toPandas_med": round(median(tp), 3),
            "noop_med": round(median(nj), 3),
            "toPandas_spread_pct": round(100 * (max(tp) - min(tp)) / median(tp), 1),
            "rows": n_rows,
        }
        print(
            f"{name}: toPandas {out[name]['toPandas_med']}s "
            f"(spread {out[name]['toPandas_spread_pct']}%), "
            f"noop {out[name]['noop_med']}s, {n_rows} rows",
            flush=True,
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
