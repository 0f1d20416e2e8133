from nkbx.core.profiling import aggregate_perfetto, format_breakdown
from nkbx.core.runtime import (
    initialize,
    enable_compilation_cache,
    enable_compilation_cache_from_cfg,
    precision_policy,
    enable_nan_debugging,
    Throughput,
    profile_trace,
)

__all__ = [
    "initialize",
    "enable_compilation_cache",
    "enable_compilation_cache_from_cfg",
    "precision_policy",
    "enable_nan_debugging",
    "Throughput",
    "profile_trace",
    "aggregate_perfetto",
    "format_breakdown",
]
