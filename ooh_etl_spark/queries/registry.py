"""Registry wiring query names to (Spark callable, DuckDB oracle SQL).

The driver contract (``__spark_entry__.py``) wants two dicts:
``queries()[name](spark, sf_dir) -> DataFrame`` and
``oracle_sql()[name] -> str`` (ANSI SQL DuckDB runs on the same parquet
views). Queries with no SQL-expressible oracle register ``oracle=None``
and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""
    #: GOLDEN oracles (VERDICT r10 item 6): an oracle whose SQL is a
    #: fixture-pinned VALUES table (rows computed by an independent
    #: pure-Python reference, tools/make_golden.py) is only valid at
    #: the pinned corpora. ``golden_guard`` is a DuckDB probe SQL
    #: returning one corpus-signature value; when its result is not in
    #: ``golden_domain``, harnesses fall back to the rows-only check
    #: (the 5x-sweep replicas are not pinned corpora). None = the
    #: oracle recomputes the answer and is valid everywhere.
    golden_guard: str | None = None
    golden_domain: frozenset[str] | None = None


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    golden_guard: str | None = None,
    golden_domain: frozenset[str] | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=fn.__doc__ or "",
            golden_guard=golden_guard,
            golden_domain=golden_domain,
        )
        return fn

    return deco


def get_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
