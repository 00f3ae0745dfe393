"""Relational operators Spark lacks natively, built as compositions.

The reference implements none of these (SURVEY.md §2 notes "joins: none");
they are part of the §2.B mandated surface. Everything here is a
composition of built-in DataFrame operators so Catalyst/AQE keep full
visibility (join strategy selection, skew splitting, pushdown).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | tuple[str, str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same key.

    Implementation: equi-join on the key with the range predicate, then
    keep the latest right row per left row via ``row_number``. The
    equi-key keeps this a hash/sort-merge join (NOT a cartesian); the
    window's partition key is the left row id, so the dedup shuffle is
    on the same key distribution as the join output.

    Scale notes (100 TB): per-key right-side history is re-scanned per
    left row only within the joined pairs; for very deep histories
    prefer bucketing both sides by the key so the join co-locates. Ties
    on ``right_ts`` are broken arbitrarily — project tie-safe columns.
    """
    lk, rk = (on, on) if isinstance(on, str) else on
    lid = "__asof_left_id"
    lt = left.withColumn(lid, F.monotonically_increasing_id())
    joined = lt.join(
        right, (lt[lk] == right[rk]) & (lt[left_ts] >= right[right_ts]), how
    )
    # Latest-right selection as max_by aggregation, NOT a ranking
    # window: aggregation gets map-side partial combine, so the shuffle
    # carries one row per left row instead of every joined pair — the
    # difference between shuffling |left| and |left|x|history| at scale.
    r_struct = F.struct(*[right[c] for c in right.columns])
    agg = joined.groupBy(lid, *[lt[c] for c in left.columns]).agg(
        F.max_by(r_struct, right[right_ts]).alias("__asof_r")
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__asof_r.{c}").alias(c) for c in right.columns
    ]
    return agg.select(*out_cols)


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
) -> DataFrame:
    """MERGE emulation (no Delta/Iceberg in this environment): rows in
    ``updates`` replace same-key rows in ``target``; unmatched update
    rows are inserted. Implemented as anti-join + union — one shuffle
    on the key, the same cost profile a MERGE INTO rewrite plans.

    Columns must match. At 100 TB the target side would be partitioned
    storage and the anti-join pruned to touched partitions (dynamic
    partition pruning handles that when the key correlates with the
    partition column).
    """
    untouched = target.join(updates, key, "left_anti")
    return untouched.unionByName(updates.select(*target.columns))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the left (skewed) side gets a random
    salt in [0, salt); the right side is replicated ``salt`` times with
    every salt value. The hot key's rows then spread across ``salt``
    reducers instead of one straggler task.

    AQE's skew-join split handles most cases automatically; explicit
    salting remains the tool when a single key exceeds what one task
    can hold even after splitting (the classic power-law key at 100 TB).
    Replication multiplies the right side — use with a dimension-sized
    right input.
    """
    lk = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    rk = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lk.join(rk, [key, "__salt"], how)
    return out.drop("__salt")


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k via ranking window; the canonical scalable
    pattern (no per-group collect, single shuffle on the group key)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
