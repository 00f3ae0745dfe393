"""Physical-plan audits: assertable properties of the plans we ship.

"Would this survive a 100× scale-up?" is checked here as code, not
prose: predicate pushdown reached the scan, small dimensions went
broadcast, nothing fell back to a cartesian product, and per-row
expression pipelines stay inside WholeStageCodegen.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(plan: str) -> bool:
    """True if the parquet scan received pushed filters."""
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_cartesian(plan: str) -> bool:
    return "CartesianProduct" in plan


def has_sort_merge_join(plan: str) -> bool:
    return "SortMergeJoin" in plan


def shuffle_count(plan: str) -> int:
    """Number of data shuffles (hash/range/round-robin exchanges) in
    the plan. Broadcast exchanges are excluded — they move a dimension,
    not the data. The formatted plan prints one
    ``Arguments: <partitioning>(...`` detail line per Exchange node."""
    import re

    return len(
        re.findall(
            r"Arguments: (?:hashpartitioning|rangepartitioning|"
            r"RoundRobinPartitioning)\(",
            plan,
        )
    )


def reads_only(plan: str, cols: set[str]) -> bool:
    """True if every parquet ReadSchema is a subset of ``cols`` —
    column pruning reached the scan."""
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        fields = {f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()}
        if not fields <= cols:
            return False
    return True
