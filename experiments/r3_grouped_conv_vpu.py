"""Round-3: gate microbench for the seresnext grouped-conv VPU attack.

PERF.md (seresnext section) banks the formulation: XLA surrounds every
32-group 3x3 conv with 0.3-0.46 ms relayout copies because 4-wide groups
can't tile the 128-lane MXU. The alternative is NOT a block-diagonal MXU
matmul (<=28% MXU utilization at group width 4 — that arithmetic is why XLA
relayouts instead) but a VPU shift-and-FMA kernel that keeps the 128-lane
channel-minor layout:

  * make the gw-1 within-group lane-rotated copies of the input tile ONCE
    per tile (2 `pltpu.roll`s + a lane select each — NOT per tap; the
    per-tap-shuffle variant is exactly the measured map-layout negative),
  * then the conv is 9 taps x gw rotations of pure elementwise FMAs against
    per-output-channel (C,) weight rows.

Math: out[o] = sum_tap sum_j w[ty,tx,j,o] * x[g*gw+j] with g = o//gw
(lax grouped-conv HWIO semantics, feature_group_count groups). Substituting
j = (o%gw + r) % gw turns the group-local gather into gw lane rotations:
out[o] = sum_r sum_tap wvec[tap,r,o] * xrot_r[o], where
xrot_r[..., l] = x[..., (l & ~(gw-1)) | ((l%gw + r) % gw)] and
wvec[tap,r,o] = w[ty,tx,(o%gw + r) % gw, o].

This measures fwd-only at the four resnext50_32x4d stage shapes against
XLA's grouped lowering (isolated, so XLA's in-context relayouts — measured
separately in the r3_postfusion_profile — are NOT in its number here; the
gate rule below accounts for them). Build the production dX/dW pair only if
the kernel wins.

Gate rule: pallas_ms < xla_ms + 2 x relayout_share (the profile attributes
~0.3-0.46 ms of copies around each grouped conv per pass).

Usage (chip idle): python experiments/r3_grouped_conv_vpu.py [--wide]
CPU correctness:   JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS="" \
                     python experiments/r3_grouped_conv_vpu.py --check
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# resnext50_32x4d stride-1 3x3 grouped-conv shapes at bs=64 @224
# (name, B, H, C, group_width); cardinality is 32 everywhere.
STAGES = [
    ("stage1", 64, 56, 128, 4),
    ("stage2", 64, 28, 256, 8),
    ("stage3", 64, 14, 512, 16),
    ("stage4", 64, 7, 1024, 32),
]

ITERS = 30


def _rotate_within_groups(x, r, gw):
    """Lane-rotate within channel groups: out[..., l] = x[..., base | ((l%gw + r) % gw)].

    Two full-axis circular rolls + one lane select (np.roll semantics:
    roll(x, s)[l] = x[l - s]): lanes with l%gw < gw-r read from l+r (roll by
    C-r); the wrap-around lanes read from l+r-gw (roll by gw-r).
    """
    if r == 0:
        return x
    c = x.shape[-1]
    a = pltpu.roll(x, shift=c - r, axis=x.ndim - 1)
    b = pltpu.roll(x, shift=gw - r, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) % gw
    return jnp.where(lane < gw - r, a, b)


def _gconv_kernel(x_ref, w_ref, o_ref, xp_ref, *, H, W, C, gw):
    # Zero-pad into VMEM scratch (halo of 1 on both spatial dims).
    xp_ref[:] = jnp.zeros((H + 2, W + 2, C), x_ref.dtype)
    xp_ref[1:H + 1, 1:W + 1, :] = x_ref[0]
    # f32 before the rotations: Mosaic's tpu.dynamic_rotate rejects bf16
    # ("Rotate with non-32-bit data" on the chip), and the FMA accumulator
    # is f32 regardless.
    xp = xp_ref[:].astype(jnp.float32)
    acc = jnp.zeros((H, W, C), jnp.float32)
    for r in range(gw):
        xr = _rotate_within_groups(xp, r, gw)
        for ty in range(3):
            for tx in range(3):
                w_row = w_ref[(ty * 3 + tx) * gw + r, :].astype(jnp.float32)
                acc = acc + (xr[ty:ty + H, tx:tx + W, :]
                             * w_row[None, None, :])
    o_ref[0] = acc.astype(o_ref.dtype)


def gconv_pallas(x, wvec, gw, interpret=None):
    b, h, w_, c = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_gconv_kernel, H=h, W=w_, C=c, gw=gw),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w_, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * gw, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w_, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, w_ + 2, c), x.dtype)],
        interpret=interpret,
    )(x, wvec)


def build_wvec(w, gw):
    """(3,3,gw,C) grouped HWIO kernel -> (9*gw, C) rotation-ordered rows."""
    c = w.shape[-1]
    o = np.arange(c)
    rows = []
    for ty in range(3):
        for tx in range(3):
            for r in range(gw):
                j = (o % gw + r) % gw
                rows.append(np.asarray(w)[ty, tx, j, o])
    return jnp.asarray(np.stack(rows), w.dtype)


def gconv_xla(x, w, groups):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def _time(fn, x):
    @jax.jit
    def chained(a):
        return jax.lax.fori_loop(0, ITERS, lambda _, v: fn(v), a)

    float(chained(x).sum())  # compile + sync (block_until_ready unreliable
    t0 = time.perf_counter()  # through the tunnel — CLAUDE.md)
    float(chained(x).sum())
    return (time.perf_counter() - t0) / ITERS * 1000


def check():
    r = np.random.RandomState(0)
    for gw in (4, 8):
        c = 8 * gw
        x = jnp.asarray(r.randn(2, 8, 8, c), jnp.float32)
        w = jnp.asarray(r.randn(3, 3, gw, c) * 0.1, jnp.float32)
        ref = gconv_xla(x, w, c // gw)
        got = gconv_pallas(x, build_wvec(w, gw), gw, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        print(f"gw={gw} check ok (max |d| = "
              f"{np.abs(np.asarray(got) - np.asarray(ref)).max():.2e})")


def main():
    wide = "--wide" in sys.argv
    r = np.random.RandomState(0)
    print(f"{'stage':8} {'gw':>3} {'GFLOP':>7} {'xla':>8} {'pallas':>8} "
          f"{'vs':>6}")
    for name, b, h, c, gw in STAGES:
        if gw > 8 and not wide:
            continue
        gflop = b * h * h * c * 9 * gw * 2 / 1e9
        x = jnp.asarray(r.randn(b, h, h, c), jnp.bfloat16)
        w = jnp.asarray(r.randn(3, 3, gw, c) * 0.05, jnp.bfloat16)
        wvec = build_wvec(w, gw)

        xla_ms = _time(lambda a: gconv_xla(a, w, c // gw), x)
        pallas_ms = _time(lambda a: gconv_pallas(a, wvec, gw), x)

        # numerics spot check on the chip too
        d = np.abs(np.asarray(gconv_pallas(x, wvec, gw), np.float32)
                   - np.asarray(gconv_xla(x, w, c // gw), np.float32)).max()
        print(f"{name:8} {gw:3d} {gflop:7.2f} {xla_ms:7.3f}m {pallas_ms:7.3f}m "
              f"{xla_ms / pallas_ms:5.2f}x  max|d|={d:.2e}")
    print("\ngate: build the production kernel only if pallas beats "
          "xla + ~2x0.3-0.46 ms relayout share at the narrow-group stages")


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    else:
        main()
