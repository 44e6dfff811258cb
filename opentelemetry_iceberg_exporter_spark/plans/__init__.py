from .inspect import (
    has_operator,
    join_strategies,
    num_shuffles,
    physical_plan,
    pushed_filters,
    scan_read_schemas,
)

__all__ = [
    "has_operator",
    "join_strategies",
    "num_shuffles",
    "physical_plan",
    "pushed_filters",
    "scan_read_schemas",
]
