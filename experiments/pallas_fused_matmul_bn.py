"""Fused 1x1-conv(matmul) + BN-apply + ReLU + output-statistics Pallas kernel.

PERF.md backlog #1/#2 prototype: in ResNet-style training the BatchNorm
statistics of each conv's output cost a separate full HBM pass (47 ms/step of
the 101 ms ResNet-50 step). A 1x1 conv over NHWC is a plain matmul over the
channel dim, so its output tile can be normalized (previous BN), activated,
AND contribute to the NEXT BN's sum/sum-of-squares while still in VMEM —
removing the standalone stats pass entirely for 1x1 convs (half of ResNet-50's
bottleneck convs).

Forward-only prototype. **Measured (v5e-1, bf16)**: parity with XLA at these
isolated shapes (0.92-1.18x: N=200k C=256 -> 1.50 vs 1.58 ms; N=50k C=512 ->
2.52 vs 2.14 ms; N=800k C=128 -> 1.80 vs 1.96 ms; outputs match to ~1e-6) —
XLA already fuses epilogue+stats onto a *matmul* producer. The train step's
47 ms of convert_reduce therefore comes from 3x3-conv outputs and the BN
*backward* reductions, which a fused epilogue on the conv itself (Mosaic conv
kernel) or a custom_vjp BN would address — round-2 work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, bias_ref, y_ref, sum_ref, sq_ref):
    i = pl.program_id(0)
    x = x_ref[...]
    w = w_ref[...]
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)  # MXU
    y = y * scale_ref[...] + bias_ref[...]                 # BN-apply epilogue
    y = jnp.maximum(y, 0.0)                                # ReLU epilogue
    y_ref[...] = y.astype(y_ref.dtype)
    s = jnp.sum(y, axis=0, keepdims=True)                  # stats of the OUTPUT
    q = jnp.sum(y * y, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        sum_ref[...] = s
        sq_ref[...] = q

    @pl.when(i > 0)
    def _():
        sum_ref[...] += s
        sq_ref[...] += q


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def fused_matmul_bn_relu_stats(x, w, scale, bias, tile_rows: int = 1024,
                               interpret: bool = False):
    """y = relu((x @ w) * scale + bias); also returns per-channel sum / sumsq of y.

    Args:
        x: (N, Cin) bf16/f32 — an NHWC activation reshaped to 2D.
        w: (Cin, Cout).
        scale, bias: (Cout,) folded BN-apply parameters of the PRODUCING conv.
    Returns:
        y (N, Cout) in x.dtype, sum (Cout,), sumsq (Cout,) in f32 — the inputs
        to the NEXT BatchNorm's mean/var, with no extra HBM pass.
    """
    n, cin = x.shape
    cout = w.shape[1]
    assert n % tile_rows == 0, (n, tile_rows)
    grid = (n // tile_rows,)
    y, s, q = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_rows, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_rows, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, cout), x.dtype),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ),
        interpret=interpret,
    )(x, w, scale.reshape(1, -1).astype(jnp.float32), bias.reshape(1, -1).astype(jnp.float32))
    return y, s[0], q[0]


def reference_matmul_bn_relu_stats(x, w, scale, bias):
    """The unfused XLA sequence this kernel replaces (3 passes over y)."""
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    y = jnp.maximum(y * scale + bias, 0.0)
    s = jnp.sum(y, axis=0)
    q = jnp.sum(y * y, axis=0)
    return y.astype(x.dtype), s, q
