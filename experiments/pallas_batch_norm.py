"""MXU-reduction BatchNorm (experimental, PERF.md backlog item).

Standard BatchNorm statistics lower to axis-reductions that run ~20% below the
chip's achievable bandwidth here (PERF.md: 185 vs 222 GB/s), and their
gradients add more reduction passes. ``FastBatchNorm`` computes per-channel
sum / sum-of-squares with MXU matmuls (``ones_row @ x``):

- the reduce streams at matmul bandwidth;
- the backward of a matmul-reduce is a broadcast (elementwise), so the stat
  gradients fuse into neighboring elementwise work instead of extra reduce
  passes;
- squares are computed on *running-mean-centered* values so bf16 inputs don't
  lose variance precision when |mean| >> std.

Interface-compatible with flax ``nn.BatchNorm(use_running_average=...)`` for
the features nkbx uses.

**MEASURED NEGATIVE RESULT (round 1, v5e-1, ResNet-50 bs=256 train step):**
218.6 ms/step vs 101.8 ms/step with flax BatchNorm — 2.1x SLOWER end-to-end.
The (1, n) x (n, c) matmul-reduce keeps the MXU nearly idle at a (1, c) output
tile and the centered-square path materializes two extra full activation
passes. Kept (unwired) as the documented experiment; the remaining BN
headroom needs stats fused into the producing conv's epilogue instead
(PERF.md backlog #2).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class FastBatchNorm(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = (
            self.use_running_average if use_running_average is None else use_running_average
        )
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if use_ra:
            mean = ra_mean.value
            var = ra_var.value
        else:
            xc = x.astype(self.dtype)
            x2 = xc.reshape(-1, c)
            n = x2.shape[0]
            ones_row = jnp.ones((1, n), self.dtype)
            # center on the running mean so bf16 squares keep variance precision
            rm = ra_mean.value.astype(self.dtype)
            xd = x2 - rm
            s = jnp.dot(ones_row, xd, preferred_element_type=jnp.float32)[0]
            q = jnp.dot(ones_row, (xd * xd).astype(self.dtype),
                        preferred_element_type=jnp.float32)[0]
            dmean = s / n  # E[x] - rm
            mean = ra_mean.value + dmean
            var = q / n - dmean * dmean  # E[(x-rm)^2] - (E[x]-rm)^2
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var

        inv = jnp.asarray(1.0, jnp.float32) / jnp.sqrt(var + self.epsilon)
        w = (scale * inv).astype(self.dtype)
        b = (bias - mean * scale * inv).astype(self.dtype)
        return x.astype(self.dtype) * w + b
