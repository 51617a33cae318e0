from .checks import (
    assert_broadcast_hash_join,
    assert_no_nested_loop_join,
    assert_pushed_filter,
    assert_read_schema_pruned,
    count_exchanges,
    formatted_plan,
    unpartitioned_window_nodes,
)

__all__ = [
    "assert_broadcast_hash_join",
    "assert_no_nested_loop_join",
    "assert_pushed_filter",
    "assert_read_schema_pruned",
    "count_exchanges",
    "formatted_plan",
    "unpartitioned_window_nodes",
]
