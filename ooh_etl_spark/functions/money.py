"""Exact integer-cents money aggregation.

Summing doubles is order-dependent, and a parallel engine sums in
whatever order partitions arrive — so ``round(sum(double), 2)`` can
land on either side of a half-cent boundary depending on the shuffle
(observed as a round-1 q91 hash mismatch at sf0.1). The engine's
money policy is therefore: round each ROW to integer cents, sum the
exact integers (associative, order-free), divide once at the end.
Spark and the DuckDB oracle apply the identical policy, so the
cross-engine hash is stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact fixed-point sum reported as a double with ``scale`` dp:
    per-row round to 10^scale units (bigint — row values are far below
    int64), accumulate in decimal(38,0), one final divide.

    The decimal accumulator is the 100 TB headroom guard: a bigint
    accumulator wraps silently (non-ANSI sum) once the total passes
    9.2e18 — reachable at ~10^13 rows of ~10^5-unit values. decimal
    sums are just as exact and order-free, carry headroom to 10^38
    (~10^36 currency units — unreachable), and Spark nulls the result
    on decimal overflow instead of wrapping, so even the failure mode
    is loud. DuckDB's twin needs no change: its sum(BIGINT) already
    accumulates in HUGEINT (int128)."""
    unit = 10**scale
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * unit).cast("bigint").cast("decimal(38,0)")) / float(unit)


def cents_avg(col: Column | str, scale: int = 2, out_scale: int | None = None) -> Column:
    """Average built from the exact fixed-point sum: the numerator is an
    integer total (order-free), so the single double division and final
    rounding are deterministic across engines and partitionings.

    The denominator is ``count(col)`` — non-null rows only — so this is
    the same statistic as SQL ``avg(col)``, which ignores NULLs; a
    ``count(*)`` denominator would silently dilute the average on
    nullable inputs. Oracle twins use ``count(expr)`` identically."""
    unit = 10**scale
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(F.round(c * unit).cast("bigint").cast("decimal(38,0)"))
    return F.round(total / float(unit) / F.count(c), out_scale or scale)


def oracle_cents_sum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`cents_sum` (same policy, same wording;
    DuckDB's sum(BIGINT) accumulates in HUGEINT natively)."""
    unit = 10**scale
    return f"sum(CAST(round(({expr}) * {unit}) AS BIGINT)) / {unit}.0"


def oracle_cents_avg(expr: str, scale: int = 2, out_scale: int | None = None) -> str:
    """DuckDB twin of :func:`cents_avg` (count(expr), not count(*):
    NULL rows are excluded from the denominator like SQL avg())."""
    unit = 10**scale
    return (
        f"round(sum(CAST(round(({expr}) * {unit}) AS BIGINT))"
        f" / {unit}.0 / count({expr}), {out_scale or scale})"
    )
