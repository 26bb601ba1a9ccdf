"""Physical-plan introspection: assertions that keep plans scale-shaped."""

from modal_vector_db_spark.plans.inspect import (
    executed_plan,
    scan_columns,
    has_pushed_data_filters,
    count_operator,
    uses_take_ordered,
    broadcast_join_count,
    broadcast_hint_sources,
    sort_merge_join_count,
    shuffle_count,
    window_group_limit_count,
    has_partial_window_group_limit,
    nested_loop_join_count,
)

__all__ = [
    "executed_plan",
    "scan_columns",
    "has_pushed_data_filters",
    "count_operator",
    "uses_take_ordered",
    "broadcast_join_count",
    "broadcast_hint_sources",
    "sort_merge_join_count",
    "shuffle_count",
    "window_group_limit_count",
    "has_partial_window_group_limit",
    "nested_loop_join_count",
]
