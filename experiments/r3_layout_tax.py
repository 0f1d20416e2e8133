"""Round-3: decision microbench for the parked "windows-in-lanes" attention
kernel variant (PERF.md, swin profile notes).

The compiled swin program inserts ~0.26 ms relayout copies at every
XLA<->Pallas boundary because XLA lays the qkv-Dense fusion output
batch-minor ({0,2,1}: window-groups G in lanes) while a TPU custom call
requires default layouts (~2-3 ms/step total). A kernel variant that takes
(N, C, G)-shaped operands would turn those copies into bitcasts — IF the
in-VMEM transpose it must then do per block costs less than the HBM relayout
it saves, and IF the lane-padding of a G-minor block (W window-groups in the
lane dim, padded to 128) doesn't blow the VMEM budget.

This measures exactly those two quantities at the four swin_tiny stage
shapes, so the (large) rework only happens if the numbers say it can win:

  1. relayout: materialized jnp transpose (G,N,C) -> (N,C,G) — an upper
     bound on what one boundary copy costs in isolation.
  2. stream: a Pallas kernel that copies (W,N,C) default-layout blocks
     unchanged — the pure HBM streaming floor for the same bytes.
  3. transpose-in-kernel: a Pallas kernel reading (N,C,W) G-minor blocks,
     transposing to (W,N,C) in VMEM, writing default layout — stream floor
     + the VMEM transpose + G-in-lanes padding tax.

Verdict rule: the variant is worth building only if
(3) - (2) < (1) x boundary-count-per-call (2 fwd + 2 bwd ~= 4x).

Usage (chip idle): python experiments/r3_layout_tax.py
CPU (interpret mode, correctness only): JAX_PLATFORMS=cpu ... --check
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# swin_tiny @224 bs=64 stage shapes: (G = bs * windows, N = 49, C = 3*dim)
STAGES = [
    ("stage1", 4096, 49, 288),
    ("stage2", 1024, 49, 576),
    ("stage3", 256, 49, 1152),
    ("stage4", 64, 49, 2304),
]

ITERS = 30


def _stream_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def _transpose_kernel(xt_ref, o_ref):
    # xt block (N, C, W) — G-minor like XLA's {0,2,1} — to (W, N, C)
    o_ref[:] = jnp.transpose(xt_ref[:], (2, 0, 1))


def _pick_w(g):
    for w in (128, 64, 32, 16, 8):
        if g % w == 0 and w <= g:
            return w
    return g


def stream(x, w):
    g, n, c = x.shape
    return pl.pallas_call(
        _stream_kernel,
        grid=(g // w,),
        in_specs=[pl.BlockSpec((w, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((w, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, c), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x)


def transpose_in_kernel(xt, w):
    n, c, g = xt.shape
    return pl.pallas_call(
        _transpose_kernel,
        grid=(g // w,),
        in_specs=[pl.BlockSpec((n, c, w), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((w, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, c), xt.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xt)


def _time(fn, *args):
    """ms/iter: chain ITERS iterations inside one jit (PERF.md discipline —
    per-dispatch tunnel microbenches are overhead-dominated)."""

    @jax.jit
    def chained(x):
        def body(_, acc):
            y = fn(acc, *args)
            # feed output back (same shape for relayout round-trip variants)
            return y
        return jax.lax.fori_loop(0, ITERS, body, x)

    return chained


def check():
    """Interpret-mode correctness of the transpose kernel."""
    for name, g, n, c in STAGES[:1]:
        x = jnp.asarray(np.random.RandomState(0).randn(256, n, c), jnp.bfloat16)
        xt = jnp.transpose(x, (1, 2, 0))
        w = _pick_w(256)
        np.testing.assert_array_equal(np.asarray(transpose_in_kernel(xt, w)),
                                      np.asarray(x))
        np.testing.assert_array_equal(np.asarray(stream(x, w)), np.asarray(x))
    print("check ok")


def main():
    r = np.random.RandomState(0)
    print(f"{'stage':8} {'GB':>6} {'relayout':>9} {'stream':>8} "
          f"{'transpose':>10} {'tax/blk':>8}")
    for name, g, n, c in STAGES:
        x = jnp.asarray(r.randn(g, n, c), jnp.bfloat16)
        gb = x.size * 2 / 1e9

        # 1) materialized jnp transpose round trip (there-and-back so the
        # chained loop keeps a constant shape); halve for one-way
        def relayout(a):
            return jnp.transpose(jnp.transpose(a, (1, 2, 0)) + 0, (2, 0, 1)) + 0

        f1 = _time(relayout)
        float(f1(x).sum())  # warm-up sync: block_until_ready is unreliable
                            # through the tunnel (CLAUDE.md) — fetch a scalar
        t0 = time.perf_counter()
        float(f1(x).sum())
        relayout_ms = (time.perf_counter() - t0) / ITERS * 1000 / 2

        w = _pick_w(g)
        f2 = _time(functools.partial(stream, w=w))
        float(f2(x).sum())  # warm-up sync (see above)
        t0 = time.perf_counter()
        float(f2(x).sum())
        stream_ms = (time.perf_counter() - t0) / ITERS * 1000

        # 3) G-minor read + VMEM transpose (shape changes, so chain manually:
        # transpose back outside — that back-transpose is XLA's, subtract
        # the measured relayout to isolate the kernel)
        def tk(a):
            return jnp.transpose(transpose_in_kernel(a, w), (1, 2, 0))

        xt = jnp.transpose(x, (1, 2, 0)) + 0
        f3 = _time(tk)
        float(f3(xt).sum())  # warm-up sync (see above)
        t0 = time.perf_counter()
        float(f3(xt).sum())
        t3 = (time.perf_counter() - t0) / ITERS * 1000
        transpose_ms = t3 - relayout_ms  # strip the closing XLA transpose

        print(f"{name:8} {gb:6.3f} {relayout_ms:8.3f}m {stream_ms:7.3f}m "
              f"{transpose_ms:9.3f}m {transpose_ms - stream_ms:7.3f}m")
    print("\nverdict: build the windows-in-lanes variant only if "
          "(transpose - stream) << 4 x relayout per call")


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    else:
        main()
