"""Physical-plan inspection helpers (pushdown/pruning assertions)."""

from duckdb_fastlanes_spark.plans.checks import (
    explain_str,
    pushed_filters,
    read_schema_columns,
)
from duckdb_fastlanes_spark.plans.progress import ProgressSnapshot, QueryProgress

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "ProgressSnapshot",
    "QueryProgress",
]
