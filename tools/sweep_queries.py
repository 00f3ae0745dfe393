"""Ad-hoc 1x/5x/10x scaling sweep for named registered queries (the
generic companion to sweep_dedup_family.py / sweep_ann_family.py):
n-run median wall times on the make_replica.py corpora, printed as
one JSON line for SCALE.md cells.

Replica dirs carry documents/embeddings/lineitem only — only queries
whose inputs are those tables can sweep here (graph family reads
lineitem; dedup/ANN read documents/embeddings).

Usage: python tools/sweep_queries.py q191b_link_prediction_capped ... [--reps N]
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

CORPORA = {
    "1x": "/root/testdata/sf0.1",
    "5x": "/tmp/sf1x5",
    "10x": "/tmp/sf1x10",
}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    from ooh_etl_spark.queries import QUERIES
    from ooh_etl_spark.session import get_spark

    spark = get_spark("query_sweep")
    out: dict = {}
    for label, d in CORPORA.items():
        t: dict = {}
        for name in args:
            QUERIES[name].fn(spark, d).count()  # untimed warm pass
            runs = []
            for _ in range(reps):
                t0 = time.monotonic()
                n = QUERIES[name].fn(spark, d).count()
                runs.append(time.monotonic() - t0)
            t[name] = {"sec": round(statistics.median(runs), 2), "rows": n}
            print(f"# {label} {name}: {t[name]}", file=sys.stderr)
        out[label] = t
    ratios = {
        name: {
            lbl: round(out[lbl][name]["sec"] / out["1x"][name]["sec"], 2)
            for lbl in ("5x", "10x")
            if lbl in out
        }
        for name in args
    }
    print(json.dumps({"timings": out, "ratios_vs_1x": ratios}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
