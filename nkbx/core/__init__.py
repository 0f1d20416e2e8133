from nkbx.core.profiling import aggregate_perfetto, format_breakdown
from nkbx.core.runtime import (
    initialize,
    precision_policy,
    enable_nan_debugging,
    Throughput,
    profile_trace,
)

__all__ = [
    "initialize",
    "precision_policy",
    "enable_nan_debugging",
    "Throughput",
    "profile_trace",
    "aggregate_perfetto",
    "format_breakdown",
]
