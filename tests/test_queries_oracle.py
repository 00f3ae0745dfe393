"""Oracle-differential test for every registered query (driver replica).

Runs at sf0.001 for speed; tools/check_oracle.py covers sf0.01.
"""

from __future__ import annotations

import pytest

from ooh_etl_spark.queries import QUERIES
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)
