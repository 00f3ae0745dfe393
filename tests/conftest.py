from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from ooh_etl_spark.session import get_spark  # noqa: E402
from ooh_etl_spark.tables import TABLE_NAMES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("ooh_etl_spark_tests")


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def assert_matches_oracle(spark, duck, name: str, sf_dir: str = SF_DIR) -> None:
    """Replicate the driver's compare for one registered query.

    Canonicalization goes through tools.check_oracle.canon_frame — the
    pandas sort_values path the driver uses — so an oracle-bearing
    query emitting an unhashable cell (list/map/struct) fails HERE
    before the driver ever sees it (round-3 q77 lesson)."""
    from tools.check_oracle import canon_frame

    from ooh_etl_spark.queries import QUERIES

    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    srows = sdf.collect()
    if spec.oracle is None:
        assert len(srows) >= 0
        return
    ores = duck.execute(spec.oracle)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(ocols)}"
    )
    scols = sorted(sdf.columns)
    sset = canon_frame(srows, sdf.columns, scols)
    oset = canon_frame(orows, ocols, scols)
    assert len(sset) == len(oset), f"{name}: rowcount {len(sset)} != {len(oset)}"
    mismatches = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
    assert sset == oset, f"{name}: value mismatch, first diffs: {mismatches}"
