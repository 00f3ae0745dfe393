"""Local replica of the driver's oracle-differential correctness gate.

Runs every ``queries()[name]`` on Spark and, where an oracle exists,
the matching ``oracle_sql()[name]`` on DuckDB over the same parquet
tables, then compares: row count, column names (sorted), and an
order-insensitive value multiset (values canonicalized to strings;
floats via repr of round(12)).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as mod
    from ooh_etl_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            status = "ROWS-ONLY"
            print(f"{status:>9} {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = sorted(d[0] for d in ores.description)
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok = True
        if scols != ocols:
            ok = False
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
        if len(srows) != len(orows):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
        if ok:
            sidx = [sdf.columns.index(c) for c in scols]
            oidx = [[d[0] for d in ores.description].index(c) for c in ocols]
            sset = sorted(tuple(canon(r[i]) for i in sidx) for r in srows)
            oset = sorted(tuple(canon(r[i]) for i in oidx) for r in orows)
            if sset != oset:
                ok = False
                diffs = [
                    (a, b) for a, b in zip(sset, oset) if a != b
                ][:3]
                print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
        if ok:
            print(f"       OK {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{ran - len(failures)}/{ran} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
