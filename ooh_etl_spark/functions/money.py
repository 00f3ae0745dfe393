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
    per-row round to 10^scale units, bigint sum, one final divide."""
    unit = 10**scale
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * unit).cast("bigint")) / float(unit)


def cents_avg(col: Column | str, scale: int = 2, out_scale: int | None = None) -> Column:
    """Average built from the exact fixed-point sum: the numerator is an
    integer total (order-free), so the single double division and final
    rounding are deterministic across engines and partitionings."""
    unit = 10**scale
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(F.round(c * unit).cast("bigint"))
    return F.round(total / float(unit) / F.count(F.lit(1)), out_scale or scale)


def oracle_cents_sum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`cents_sum` (same policy, same wording)."""
    unit = 10**scale
    return f"sum(CAST(round(({expr}) * {unit}) AS BIGINT)) / {unit}.0"


def oracle_cents_avg(expr: str, scale: int = 2, out_scale: int | None = None) -> str:
    """DuckDB twin of :func:`cents_avg`."""
    unit = 10**scale
    return (
        f"round(sum(CAST(round(({expr}) * {unit}) AS BIGINT))"
        f" / {unit}.0 / count(*), {out_scale or scale})"
    )
