"""Local replica of the driver's oracle-differential correctness gate.

Runs every ``queries()[name]`` on Spark and, where an oracle exists,
the matching ``oracle_sql()[name]`` on DuckDB over the same parquet
tables, then compares: row count, column names (sorted), and an
order-insensitive value multiset.

DRIVER FIDELITY: the driver canonicalizes results through pandas
``DataFrame.sort_values`` over the name-sorted columns.  pandas raises
``TypeError: unhashable type`` on list/dict cells during that sort, so
any query emitting a top-level array/map/struct column FAILS the
driver even if the values match (round-3 q77 lesson).  This replica
therefore sorts through the SAME pandas path — it must never pass a
result shape the driver would reject.  Float canonicalization
(repr of round(9)) is applied after the pandas sort.

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
    return str(v)


def canon_frame(rows, cols_in_row_order, sorted_cols):
    """Canonicalize a result the way the driver does: pandas frame,
    name-sorted columns, ``sort_values`` over every column (raises
    TypeError on unhashable cells — deliberately NOT caught here so
    the replica fails where the driver fails), then per-cell string
    canonicalization.

    Missing values are normalized to None on BOTH sides before the
    sort: pandas coerces None→NaN only in columns it infers as float64,
    so a Spark float column and a DuckDB Decimal (object-dtype) column
    holding the same NULLs would otherwise canonicalize asymmetrically
    ('NaN' vs '<NULL>') — a false mismatch the driver (which converts
    both engines' results through the same pandas path) doesn't see."""
    import pandas as pd

    df = pd.DataFrame.from_records(list(rows), columns=list(cols_in_row_order))
    df = df[sorted_cols].astype(object)
    mask = df.map(lambda v: v is None or (isinstance(v, float) and math.isnan(v)))
    df = df.where(~mask, None)
    df = df.sort_values(by=sorted_cols, kind="mergesort").reset_index(drop=True)
    return [tuple(canon(v) for v in row) for row in df.itertuples(index=False)]


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
            try:
                sset = canon_frame(srows, sdf.columns, scols)
                oset = canon_frame(
                    orows, [d[0] for d in ores.description], ocols
                )
            except TypeError as e:
                failures.append(name)
                print(f"FAIL {name}: driver-canon error (unhashable cell?): {e}")
                continue
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
