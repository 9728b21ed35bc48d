"""Physical-plan inspection utilities (the scale audit toolbox)."""

from .inspect import (  # noqa: F401
    broadcast_join_count,
    codegen_stage_count,
    explain_str,
    has_partial_aggregation,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    without_aqe,
)
