"""Integer-cents money policy, stressed at sf0.1 (VERDICT r3 item 9).

The round-1 lesson: ``round(sum(double), 2)`` is partitioning-dependent
— at sf0.1 the q91 hash landed on the wrong side of a half-cent
boundary. The cents policy (functions/money.py) fixed it, but the
oracle-differential suite runs at sf0.001/sf0.01, where totals are
small enough that a drifting sum might still round identically. This
test runs the three headline money queries against DuckDB at sf0.1 —
enough rows (~600k lineitem) that any reintroduced double-sum drift or
fixture regeneration lands on a half-cent boundary somewhere.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from ooh_etl_spark.tables import TABLE_NAMES
from tests.conftest import assert_matches_oracle

SF01_DIR = "/root/testdata/sf0.1"

MONEY_QUERIES = [
    "q01_pricing_summary",  # cents_sum + cents_avg, 8 aggregates
    "q05_regional_revenue",  # cents_sum over a 5-way star join
    "q91_profit_by_nation",  # the original round-1 half-cent failure
]


@pytest.fixture(scope="module")
def duck_sf01():
    if not os.path.isdir(SF01_DIR):  # pragma: no cover - driver always writes it
        pytest.skip(f"{SF01_DIR} not present")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", MONEY_QUERIES)
def test_money_query_matches_oracle_at_sf01(spark, duck_sf01, name):
    assert_matches_oracle(spark, duck_sf01, name, sf_dir=SF01_DIR)
