"""Physical-plan inspection utilities."""

from distribot_spark.plans.inspect import (
    explain_string,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
    uses_python_eval,
)

__all__ = [
    "explain_string",
    "pushed_filters",
    "read_schemas",
    "has_broadcast_join",
    "uses_python_eval",
]
