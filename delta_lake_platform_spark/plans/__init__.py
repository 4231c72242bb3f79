from .introspect import (
    count_exchanges,
    explain_str,
    has_broadcast_hash_join,
    has_sort_merge_join,
    has_window_group_limit,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "count_exchanges",
    "explain_str",
    "has_broadcast_hash_join",
    "has_sort_merge_join",
    "has_window_group_limit",
    "has_whole_stage_codegen",
    "pushed_filters",
    "read_schema_columns",
]
