from .inspect import (
    executed_plan,
    has_row_python,
    pushed_filters,
    python_node_count,
    read_schema,
    unpartitioned_windows,
)

__all__ = [
    "executed_plan",
    "has_row_python",
    "pushed_filters",
    "python_node_count",
    "read_schema",
    "unpartitioned_windows",
]
