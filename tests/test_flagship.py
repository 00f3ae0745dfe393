from __future__ import annotations

from tests.conftest import assert_matches_oracle


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0


def test_flagship_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "flagship_doc_scan")


def test_registry_contract():
    """Every oracle key has a query; all queries are callable."""
    import __spark_entry__ as mod

    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert set(os_) <= set(qs)
    for fn in qs.values():
        assert callable(fn)


def test_observation_metrics_without_second_pass(spark):
    # df.observe(): accumulate pipeline metrics DURING the action — the
    # operational pattern for 100 TB jobs where a separate metrics pass
    # would double the read (same idea as q111's counters, but free).
    from pyspark.sql import Observation
    from pyspark.sql import functions as F
    from ooh_etl_spark.tables import load_table
    from tests.conftest import SF_DIR

    obs = Observation("ingest_metrics")
    li = load_table(spark, SF_DIR, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows_read"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("high_discount"),
    )
    n = li.filter(F.col("l_quantity") > 0).count()
    assert obs.get["rows_read"] == n  # all rows pass the filter
    assert 0 < obs.get["high_discount"] < n
