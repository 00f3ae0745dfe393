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
