"""Physical-plan audit helpers (SURVEY.md §4).

The reference delegates planning to Flink; we delegate to Catalyst — and
VERIFY the plans we get: pushdown reached the scan, small dims broadcast,
no accidental single-partition windows, codegen covers the hot path.
"""

from flink_cdc_connectors_spark.plans.audit import (
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    read_schema_columns,
    shuffle_count,
    has_single_partition_exchange,
    has_single_partition_window,
    wholestage_codegen_count,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_pushed_filters",
    "read_schema_columns",
    "shuffle_count",
    "has_single_partition_exchange",
    "has_single_partition_window",
    "wholestage_codegen_count",
]
