"""Probe: can Mosaic lower the in-kernel shuffles a map-layout window-attention
kernel needs?

The round-3 swin device profile (PERF.md) leaves ~1.5 ms/step of window
partition/reverse copies plus ~2-3 ms of XLA<->Pallas relayout tax. A kernel
that reads the (B, Hm, Wm, 3C) qkv map directly (window extraction via index
maps + in-VMEM shuffles) and writes the (B, Hm, Wm, C) output map would fold
all four copies into VMEM traffic. Whether that is possible/cheap hinges on
two Mosaic lowerings, probed here in isolation on the chip:

  P1 gather:  (7, 7k, 3C) stripe -> (k, 49, 3C) windows
              [k slices -> stack -> UNALIGNED sublane-merge reshape]
  P2 scatter: (k, 49, C) windows -> (7, 7k, C) stripe
              [reshape -> untiled transpose -> unaligned merge]

Each probe runs as a tiny pallas_call; we report compile success and the
measured cost per stripe vs a pure-copy kernel baseline (the delta is the
shuffle cost the integrated kernel would pay in place of the HBM copies).

Usage: PYTHONPATH=/root/.axon_site python experiments/r3_map_attention_probe.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 8          # windows per stripe block
WIN = 7
N = WIN * WIN
C3 = 288       # stage-1 swin_tiny 3*C
DTYPE = jnp.bfloat16


def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def gather_kernel(x_ref, o_ref):
    # x (1, 7, 7K, C3) -> o (1, K, 49, C3)
    win = x_ref[0]
    parts = [win[:, WIN * t:WIN * (t + 1), :] for t in range(K)]
    stk = jnp.stack(parts, 0)                     # (K, 7, 7, C3)
    o_ref[0] = stk.reshape(K, N, C3)              # unaligned sublane merge


def scatter_kernel(x_ref, o_ref):
    # x (1, K, 49, C3) -> o (1, 7, 7K, C3)
    stk = x_ref[0].reshape(K, WIN, WIN, C3)
    rev = stk.transpose(1, 0, 2, 3)               # (7, K, 7, C3) untiled swap
    o_ref[0] = rev.reshape(WIN, WIN * K, C3)      # unaligned merge


def run(name, kern, in_shape, out_shape, grid_b=512, iters=50):
    x = jnp.asarray(np.random.randn(grid_b, *in_shape[1:]).astype(np.float32),
                    DTYPE)
    spec_in = pl.BlockSpec(in_shape, lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec(out_shape, lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    try:
        fn = jax.jit(functools.partial(
            pl.pallas_call, kern, grid=(grid_b,), in_specs=[spec_in],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct((grid_b,) + out_shape[1:], DTYPE),
        )())
        def chained(x):
            def body(i, acc):
                return fn(acc * 1.0) if acc.shape == x.shape else acc
            y = fn(x)
            return jnp.sum(y.astype(jnp.float32))
        y = fn(x)
        s = float(jnp.sum(y.astype(jnp.float32)))  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(x)
        s = float(jnp.sum(y.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: OK  {dt*1e3:.3f} ms/call  (checksum {s:.1f})")
        return dt
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:200]
        print(f"{name}: FAILED — {type(e).__name__}: {msg}")
        return None


def check_gather_semantics():
    """interpret-mode correctness of the gather/scatter shuffles."""
    x = jnp.arange(7 * 7 * K * C3, dtype=jnp.float32).reshape(1, 7, 7 * K, C3)
    spec_in = pl.BlockSpec((1, 7, 7 * K, C3), lambda i: (i, 0, 0, 0))
    spec_out = pl.BlockSpec((1, K, N, C3), lambda i: (i, 0, 0, 0))
    y = pl.pallas_call(gather_kernel, grid=(1,), in_specs=[spec_in],
                       out_specs=spec_out,
                       out_shape=jax.ShapeDtypeStruct((1, K, N, C3),
                                                      jnp.float32),
                       interpret=True)(x)
    # reference window partition of the stripe
    ref = x[0].reshape(7, K, 7, C3).transpose(1, 0, 2, 3).reshape(K, N, C3)
    assert np.allclose(np.asarray(y[0]), np.asarray(ref)), "gather semantics"
    back = pl.pallas_call(scatter_kernel, grid=(1,),
                          in_specs=[pl.BlockSpec((1, K, N, C3),
                                                 lambda i: (i, 0, 0, 0))],
                          out_specs=pl.BlockSpec((1, 7, 7 * K, C3),
                                                 lambda i: (i, 0, 0, 0)),
                          out_shape=jax.ShapeDtypeStruct((1, 7, 7 * K, C3),
                                                         jnp.float32),
                          interpret=True)(y)
    assert np.allclose(np.asarray(back), np.asarray(x)), "scatter semantics"
    print("interpret-mode semantics: OK (gather/scatter are inverses)")


if __name__ == "__main__":
    if "cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    check_gather_semantics()
    if jax.default_backend() != "tpu":
        print("no TPU — semantics check only")
        sys.exit(0)
    base = run("copy-stripe   (1,7,56,C3)->(same)", copy_kernel,
               (1, 7, 7 * K, C3), (1, 7, 7 * K, C3))
    g = run("gather-windows (1,7,56,C3)->(1,8,49,C3)", gather_kernel,
            (1, 7, 7 * K, C3), (1, K, N, C3))
    s = run("scatter-stripe (1,8,49,C3)->(1,7,56,C3)", scatter_kernel,
            (1, K, N, C3), (1, 7, 7 * K, C3))
    if base and g and s:
        print(f"shuffle overhead vs copy: gather +{(g-base)*1e3:.3f} ms, "
              f"scatter +{(s-base)*1e3:.3f} ms per 512-stripe call")
