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


def cents_sum(col: Column | str, scale: int = 2, wide: bool = False) -> Column:
    """Exact fixed-point sum reported as a double with ``scale`` dp:
    per-row round to 10^scale units, integer sum, one final divide.

    Accumulator headroom (non-ANSI Spark sum wraps SILENTLY on int64
    overflow): the default bigint accumulator is exact to 9.2e18 units
    — at TPC-H-like magnitudes (~5e7 cents/row) that is ~1.8e11 rows
    PER GROUP, comfortably beyond a 100 TB fact table's per-group
    cardinality for grouped aggregates, but approachable for a GLOBAL
    sum at extreme scale. For those, pass ``wide=True``: the
    decimal(38,0) accumulator is equally exact and order-free, carries
    headroom to 10^38, and NULLs loudly on overflow instead of
    wrapping — but decimal precision > 18 leaves Spark's long-backed
    Decimal fast path, measured 2.2x slower on q01's 8-aggregate scan
    at sf0.1, so it is opt-in rather than the default. DuckDB twins
    need no flag: its sum(BIGINT) accumulates in HUGEINT natively."""
    unit = 10**scale
    c = F.col(col) if isinstance(col, str) else col
    acc = F.round(c * unit).cast("bigint")
    if wide:
        acc = acc.cast("decimal(38,0)")
    return F.sum(acc) / float(unit)


def cents_avg(
    col: Column | str,
    scale: int = 2,
    out_scale: int | None = None,
    wide: bool = False,
) -> Column:
    """Average built from the exact fixed-point sum: the numerator is an
    integer total (order-free), so the single double division and final
    rounding are deterministic across engines and partitionings.
    ``wide`` selects the decimal(38,0) accumulator (see cents_sum).

    The denominator is ``count(col)`` — non-null rows only — so this is
    the same statistic as SQL ``avg(col)``, which ignores NULLs; a
    ``count(*)`` denominator would silently dilute the average on
    nullable inputs. Oracle twins use ``count(expr)`` identically."""
    unit = 10**scale
    c = F.col(col) if isinstance(col, str) else col
    acc = F.round(c * unit).cast("bigint")
    if wide:
        acc = acc.cast("decimal(38,0)")
    return F.round(F.sum(acc) / float(unit) / F.count(c), out_scale or scale)


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
