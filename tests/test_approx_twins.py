"""Band-tolerance checks for the approx twins of the global-window
queries (queries/windows.py): the scale-safe forms must agree with
their exact single-partition twins within sketch tolerance, and q149b
must agree with q149 EXACTLY (it is the same statistic, re-planned).
"""

from __future__ import annotations

import pytest

# Oracle-replica / deep-functional suite: excluded from the default
# fast-core gate run (see pytest.ini); run with `-m slow`.
pytestmark = pytest.mark.slow


from ooh_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR


def _rows(spark, name):
    return QUERIES[name].fn(spark, SF_DIR).collect()


def test_q72b_quartile_populations_within_tolerance(spark):
    exact = {r["quartile"]: r["n"] for r in _rows(spark, "q72_price_quartiles")}
    approx = {r["quartile"]: r["n"] for r in _rows(spark, "q72b_price_quartiles_approx")}
    total = sum(exact.values())
    assert sum(approx.values()) == total  # every row lands in exactly one band
    for q in exact:
        # percentile_approx at accuracy 1e5 is near-exact at test SF;
        # allow 5% of total per band for boundary-tie reassignment.
        assert abs(approx[q] - exact[q]) <= max(2, total * 0.05), (q, exact, approx)


def test_q139b_bucket_populations_within_tolerance(spark):
    exact = {r["bucket"]: r["n"] for r in _rows(spark, "q139_equi_depth_histogram")}
    approx = {
        r["bucket"]: r["n"] for r in _rows(spark, "q139b_equi_depth_histogram_approx")
    }
    total = sum(exact.values())
    assert sum(approx.values()) == total
    for b in exact:
        assert abs(approx.get(b, 0) - exact[b]) <= max(2, total * 0.05), (
            b,
            exact,
            approx,
        )


def test_q149b_matches_q149_exactly(spark):
    exact = _rows(spark, "q149_id_gap_detection")
    ranged = _rows(spark, "q149b_id_gap_detection_ranged")
    assert [r.asDict() for r in exact] == [r.asDict() for r in ranged]
