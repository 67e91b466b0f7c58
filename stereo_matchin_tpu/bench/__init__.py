"""Per-stage benchmark harness (reference TSV format) and throughput report."""

from .harness import (
    ASW_COLUMNS,
    CROSS_COLUMNS,
    StageTimer,
    run_benchmark,
    time_asw_method,
    time_cross_method,
)

__all__ = [
    "ASW_COLUMNS",
    "CROSS_COLUMNS",
    "StageTimer",
    "run_benchmark",
    "time_asw_method",
    "time_cross_method",
]
