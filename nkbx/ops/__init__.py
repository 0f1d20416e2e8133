"""Production Pallas kernels (measured wins only — negative-result
experiments live under /experiments, see PERF.md)."""

from nkbx.ops.attention import (
    disable_fused,
    fused_attention,
    fused_attention_qkv,
    reference_attention,
)

__all__ = ["disable_fused", "fused_attention", "fused_attention_qkv",
           "reference_attention"]
