"""Helpers for asserting plan quality (SURVEY §4.2: the optimizations the
reference delegates to DuckDB must be visibly present in our Catalyst
physical plans — pushdown, pruning, top-k, broadcast).

These read the *executed* (post-AQE) plan string.  Used by
``tests/test_plans.py`` so a regression that silently de-optimizes a plan
(e.g. a cast blocking pushdown, a join falling back to sort-merge-on-fact)
fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_columns(df: DataFrame, table_hint: str = "") -> list[list[str]]:
    """Column lists of each parquet FileScan (column-pruning check)."""
    plan = executed_plan(df)
    out = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", plan):
        cols = [c.split("#")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_pushed_data_filters(df: DataFrame) -> bool:
    """True if at least one scan carries DataFilters/PushedFilters."""
    plan = executed_plan(df)
    return bool(re.search(r"(DataFilters|PushedFilters): \[[^\]]+\]", plan))


def count_operator(df: DataFrame, op: str) -> int:
    return executed_plan(df).count(op)


def uses_take_ordered(df: DataFrame) -> bool:
    """ORDER BY + LIMIT planned as TakeOrderedAndProject (bounded-heap
    top-k), never a global Sort."""
    return "TakeOrderedAndProject" in executed_plan(df)


def broadcast_join_count(df: DataFrame) -> int:
    return count_operator(df, "BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return count_operator(df, "SortMergeJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the executed plan."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan))
