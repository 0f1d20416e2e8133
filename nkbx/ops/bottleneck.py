"""Fused ResNet bottleneck-chain Pallas kernel (max-throughput tier).

The round-3 bytes/image budget (PERF.md) showed 90.8% of the exact-BN
ResNet-50 step's HBM traffic is conv-activation movement the exact algorithm
requires: every identity bottleneck block stores its three pre-BN conv
outputs forward and re-reads them (plus the gradient chain) backward —
~13.5 block-output-sized HBM tensors per block against an irreducible 5
(x, out forward; x, dout, dx backward). Exact BatchNorm blocks tiling: the
batch statistics are global over (B, H, W), so the chain cannot run
tile-by-tile in VMEM without changing semantics (round-1/2 negative result).

This kernel takes the semantics change as a LABELED OPT-IN
(``ResNet(ghost_bn=g, fused_bottleneck=True)``, reference precedent: AMP
autocast, engine.py:43-47): BatchNorm statistics become **tile-local** —
each statistic group is one kernel tile of ``g`` ghost-batch samples x
``th`` image rows (the full width). With stats local to a tile, the whole
stride-1 identity block — conv1x1 + BN + relu -> conv3x3 + BN + relu ->
conv1x1 + BN -> +residual -> relu — runs as ONE VMEM-resident program per
pass: forward reads x and writes out; backward re-derives everything
tile-wise (flash-style recompute, same pattern as nkbx/ops/mlp.py) and
emits dx plus f32-accumulated weight/BN grads. The per-tile mean/var are
emitted as tiny side outputs; running stats aggregate their mean (unbiased,
n = g*th*W — the ghost-BN update rule, nkbx.models.common.TorchBatchNorm).

The 3x3 conv's one-row halo is fed by two extra one-row BlockSpec inputs
(clamped index maps, edge rows zeroed in-kernel) — no manual DMA; halo rows'
a1 is recomputed with the OWNING tile's stats, and their input-gradient
contribution is emitted as per-tile du1 halo rows, folded in with one cheap
XLA scatter-add outside the kernel.

Stage geometry is gated by a static VMEM model (:func:`chain_tile`):
ResNet-50 @224 at ghost_bn=2 fits stages 1-3 with row bands th=8/7/2 (tile
rows 896/392/56); stage 4's 3x3x512x512 weights + f32 grad accumulators
alone exceed VMEM, so it stays on XLA (5.7% of traffic). Measured on chip
the kernel LOSES 3-6x to XLA at every stage (PERF.md round-4 post-mortem) —
it ships as a tested, gated opt-in documenting that conclusion.

Numerics: matmuls accumulate f32 (``preferred_element_type``), BN stats and
normalization in f32, activations bf16 between ops — the same staging as the
XLA path (which also computes conv accumulation + fused BN stats in f32),
so f32-mode equality tests are tight (tests/test_fused_bottleneck.py).

Mesh: like the other fused kernels, ``pallas_call`` has no GSPMD rule —
under a declared ops mesh (nkbx.ops.attention.set_attention_mesh) the entry
lowers per-shard via ``jax.shard_map`` with the batch on the data axis and
weight grads summed across shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nkbx.ops import attention as _attn

_VMEM_BUDGET = 12_000_000  # bytes; headroom below the ~16 MB VMEM


def _pad(x, t):
    return -(-x // t) * t


def _tile_bytes(g, th, w, c, m, itemsize, bwd):
    """Static VMEM estimate for one (g, th) tile (double-buffered streams +
    resident weights/grads + f32 intermediates)."""
    rows = g * th * w
    rows_ext = g * (th + 2) * w
    e = rows * _pad(c, 128)          # padded C-wide elems (core rows)
    e_ext = rows_ext * _pad(c, 128)
    emid = rows * _pad(m, 128)
    emid_ext = rows_ext * _pad(m, 128)
    # streams: x core + 2 halo rows in, out/dx out, dout in (bwd) — x2 buffers
    streams = 2 * (e_ext + e) * itemsize + (2 * e * itemsize if bwd else 0)
    weights = (2 * _pad(c, 8) * _pad(m, 128) + 9 * _pad(m, 8) * _pad(m, 128)) * itemsize
    interm = (4 + 4) * emid_ext + (2 + 4 + 4) * emid + (4 + 4 + 2) * e
    if bwd:
        weights *= 3  # + f32 grad accumulators
        interm += (4 + 4) * e + (4 + 2) * emid + (4 + 2) * emid_ext
    return streams + weights + interm


def chain_tile(b, h, w, c, m, g, itemsize=2):
    """Pick the row-band height ``th`` for a (g x th x W)-tile chain kernel,
    or None when no geometry fits VMEM (the block then stays on XLA).

    ``g`` is the ghost batch group (must divide b); th divides h. Larger
    tiles amortize better, so the largest viable divisor wins."""
    if g <= 0 or b % g:
        return None
    for th in sorted((d for d in range(1, h + 1) if h % d == 0), reverse=True):
        if (_tile_bytes(g, th, w, c, m, itemsize, bwd=True) <= _VMEM_BUDGET
                and _tile_bytes(g, th, w, c, m, itemsize, bwd=False)
                <= _VMEM_BUDGET):
            return th
    return None


# --- kernels -----------------------------------------------------------------


def _conv3x3(a1p_2d, w2_ref, g, th, w, m, out_rows_th):
    """SAME 3x3 conv of a1p ((g, th+2, W+2, M) given flattened) producing
    (g*out_rows_th*W, M) f32 — nine shifted matmuls, f32 accumulation."""
    a1p = a1p_2d.reshape(g, th + 2, w + 2, m)
    u = None
    for dy in range(3):
        for dx in range(3):
            sl = a1p[:, dy:dy + out_rows_th, dx:dx + w, :].reshape(-1, m)
            t = jax.lax.dot_general(sl, w2_ref[dy, dx],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            u = t if u is None else u + t
    return u


def _pad_w(a, g, rows_h, w, m, dtype):
    """Zero-pad the W (width) dim by 1 on both sides: (g, rows_h, W, M) ->
    (g, rows_h, W+2, M)."""
    z = jnp.zeros((g, rows_h, 1, m), dtype)
    return jnp.concatenate([z, a.reshape(g, rows_h, w, m), z], axis=2)


def _recompute(x_lo, x_core, x_hi, w1_ref, w2_ref, s1, b1, s2, b2,
               g, th, w, c, m, eps, j, nh, dtype):
    """Shared fwd/bwd recompute up to a2. Returns a dict of intermediates."""
    # halo rows: zeroed at the image edges (their index maps clamp)
    x_lo = jnp.where(j == 0, jnp.zeros_like(x_lo), x_lo)
    x_hi = jnp.where(j == nh - 1, jnp.zeros_like(x_hi), x_hi)
    x_ext = jnp.concatenate([x_lo, x_core, x_hi], axis=1)  # (g, th+2, W, C)
    x2_ext = x_ext.reshape(-1, c)
    rows_ext = g * (th + 2) * w
    u1 = jax.lax.dot_general(x2_ext, w1_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # BN1 stats over CORE rows only (the (g, th) tile is the stat group);
    # halo rows are normalized with the owning tile's stats. Core rows of
    # the flattened ext layout = rows whose th+2 index is in [1, th].
    # (iota built directly at (rows_ext, 1) — a 3D iota reshaped to a
    # 1-lane column is an unsupported Mosaic shape cast)
    hidx = (jax.lax.broadcasted_iota(jnp.int32, (rows_ext, 1), 0)
            // w) % (th + 2)
    in_core = (hidx >= 1) & (hidx <= th)
    n_core = g * th * w
    inv_n = 1.0 / n_core
    uc = jnp.where(in_core, u1, 0.0)
    mu1 = jnp.sum(uc, axis=0, keepdims=True) * inv_n
    mu1sq = jnp.sum(uc * u1, axis=0, keepdims=True) * inv_n
    var1 = jnp.maximum(mu1sq - mu1 * mu1, 0.0)
    rstd1 = jax.lax.rsqrt(var1 + eps)
    xhat1 = (u1 - mu1) * rstd1
    z1 = xhat1 * s1 + b1
    # halo rows at the IMAGE edges are the 3x3 conv's zero padding — they
    # must be zero in the ACTIVATION domain (bn(0) is not 0); interior halo
    # rows keep their recomputed values
    keep = jnp.logical_not(((hidx == 0) & (j == 0))
                           | ((hidx == th + 1) & (j == nh - 1)))
    a1 = jnp.where(keep, jnp.maximum(z1, 0.0), 0.0).astype(dtype)
    a1p = _pad_w(a1, g, th + 2, w, m, dtype)       # (g, th+2, W+2, M)
    u2 = _conv3x3(a1p.reshape(-1, m), w2_ref, g, th, w, m, th)  # core rows
    mu2 = jnp.mean(u2, axis=0, keepdims=True)
    var2 = jnp.maximum(jnp.mean(u2 * u2, axis=0, keepdims=True)
                       - mu2 * mu2, 0.0)
    rstd2 = jax.lax.rsqrt(var2 + eps)
    xhat2 = (u2 - mu2) * rstd2
    z2 = xhat2 * s2 + b2
    a2 = jnp.maximum(z2, 0.0).astype(dtype)        # (rows, M)
    return dict(x2_ext=x2_ext, u1=u1, in_core=in_core, keep=keep, mu1=mu1,
                var1=var1, rstd1=rstd1, xhat1=xhat1, z1=z1, a1=a1, a1p=a1p,
                u2=u2, mu2=mu2, var2=var2, rstd2=rstd2, xhat2=xhat2, z2=z2,
                a2=a2)


def _fwd_kernel(x_lo_ref, x_core_ref, x_hi_ref, w1_ref, w2_ref, w3_ref,
                s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref,
                out_ref, m1_ref, v1_ref, m2_ref, v2_ref, m3_ref, v3_ref, *,
                g, th, w, c, m, eps, nh, dtype):
    j = pl.program_id(1)
    r = _recompute(x_lo_ref[:], x_core_ref[:], x_hi_ref[:], w1_ref, w2_ref,
                   s1_ref[:].astype(jnp.float32), b1_ref[:].astype(jnp.float32),
                   s2_ref[:].astype(jnp.float32), b2_ref[:].astype(jnp.float32),
                   g, th, w, c, m, eps, j, nh, dtype)
    u3 = jax.lax.dot_general(r["a2"], w3_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mu3 = jnp.mean(u3, axis=0, keepdims=True)
    var3 = jnp.maximum(jnp.mean(u3 * u3, axis=0, keepdims=True)
                       - mu3 * mu3, 0.0)
    rstd3 = jax.lax.rsqrt(var3 + eps)
    y3 = ((u3 - mu3) * rstd3 * s3_ref[:].astype(jnp.float32)
          + b3_ref[:].astype(jnp.float32)).astype(dtype)
    x_core2 = x_core_ref[:].reshape(-1, c)
    out = jnp.maximum(y3 + x_core2, 0)
    out_ref[:] = out.reshape(g, th, w, c)
    m1_ref[:] = r["mu1"][None]
    v1_ref[:] = r["var1"][None]
    m2_ref[:] = r["mu2"][None]
    v2_ref[:] = r["var2"][None]
    m3_ref[:] = mu3[None]
    v3_ref[:] = var3[None]


def _bn_bwd_partial(dz, xhat, rstd, s, in_core, inv_n):
    """Tile-local BN backward where stats come from the ``in_core`` subset
    but all rows consume them: du = rstd*(s*dz - [core]*(S1 + xhat*S2)/n)
    with S1 = sum(s*dz), S2 = sum(s*dz*xhat) over ALL rows. Returns
    (du_f32, dscale_row, dbias_row)."""
    d = dz * s
    s1 = jnp.sum(d, axis=0, keepdims=True)
    s2 = jnp.sum(d * xhat, axis=0, keepdims=True)
    corr = (s1 + xhat * s2) * inv_n
    if in_core is not None:
        corr = jnp.where(in_core, corr, 0.0)
    du = rstd * (d - corr)
    ds = jnp.sum(dz * xhat, axis=0, keepdims=True)
    db = jnp.sum(dz, axis=0, keepdims=True)
    return du, ds, db


def _bwd_kernel(x_lo_ref, x_core_ref, x_hi_ref, w1_ref, w2_ref, w3_ref,
                s1_ref, b1_ref, s2_ref, b2_ref, s3_ref, b3_ref, dout_ref,
                dx_ref, du1lo_ref, du1hi_ref,
                dw1_ref, dw2_ref, dw3_ref,
                ds1_ref, db1_ref, ds2_ref, db2_ref, ds3_ref, db3_ref, *,
                g, th, w, c, m, eps, nh, dtype):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        for ref in (dw1_ref, dw2_ref, dw3_ref, ds1_ref, db1_ref,
                    ds2_ref, db2_ref, ds3_ref, db3_ref):
            ref[:] = jnp.zeros_like(ref)

    j = pl.program_id(1)
    f32 = jnp.float32
    s1 = s1_ref[:].astype(f32)
    s2 = s2_ref[:].astype(f32)
    s3 = s3_ref[:].astype(f32)
    r = _recompute(x_lo_ref[:], x_core_ref[:], x_hi_ref[:], w1_ref, w2_ref,
                   s1, b1_ref[:].astype(f32), s2, b2_ref[:].astype(f32),
                   g, th, w, c, m, eps, j, nh, dtype)
    rows = g * th * w
    inv_n = 1.0 / rows
    u3 = jax.lax.dot_general(r["a2"], w3_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mu3 = jnp.mean(u3, axis=0, keepdims=True)
    var3 = jnp.maximum(jnp.mean(u3 * u3, axis=0, keepdims=True)
                       - mu3 * mu3, 0.0)
    rstd3 = jax.lax.rsqrt(var3 + eps)
    xhat3 = (u3 - mu3) * rstd3
    y3 = (xhat3 * s3 + b3_ref[:].astype(f32)).astype(dtype)
    x_core2 = x_core_ref[:].reshape(-1, c)
    # final relu mask recomputed bit-identically to the forward's rounding
    # (the ADD stays in the compute dtype; the compare runs f32 — Mosaic has
    # no bf16 compare on this target)
    mask_out = (y3 + x_core2).astype(f32) > 0
    dy = jnp.where(mask_out, dout_ref[:].reshape(-1, c), 0).astype(f32)
    # BN3 backward (stats over all core rows; consumers == stat set)
    du3, ds3, db3 = _bn_bwd_partial(dy, xhat3, rstd3, s3, None, inv_n)
    ds3_ref[:] += ds3
    db3_ref[:] += db3
    du3b = du3.astype(dtype)
    dw3_ref[:] += jax.lax.dot_general(r["a2"], du3b, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    da2 = jax.lax.dot_general(du3b, w3_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # relu2 + BN2 backward
    dz2 = jnp.where(r["z2"] > 0, da2, 0.0)
    du2, ds2, db2 = _bn_bwd_partial(dz2, r["xhat2"], r["rstd2"], s2,
                                    None, inv_n)
    ds2_ref[:] += ds2
    db2_ref[:] += db2
    du2b = du2.astype(dtype)
    # conv2 backward: dW2[dy,dx] += a1p-slice^T du2 ; da1 = full-corr(du2)
    du2p = _pad_w(du2b, g, th, w, m, dtype)              # (g, th, W+2, M)
    # H pad is 2 each side: the input-grad's output extent is the EXT rows
    # (th+2), so slices [dyy : dyy+th+2] need a th+4 extent
    du2p = jnp.concatenate(
        [jnp.zeros((g, 2, w + 2, m), dtype), du2p,
         jnp.zeros((g, 2, w + 2, m), dtype)], axis=1)    # (g, th+4, W+2, M)
    a1p = r["a1p"]                                        # (g, th+2, W+2, M)
    da1 = None
    for dyy in range(3):
        for dxx in range(3):
            sl = a1p[:, dyy:dyy + th, dxx:dxx + w, :].reshape(-1, m)
            dw2_ref[dyy, dxx] += jax.lax.dot_general(
                sl, du2b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            slg = du2p[:, dyy:dyy + th + 2, dxx:dxx + w, :].reshape(-1, m)
            t = jax.lax.dot_general(slg, w2_ref[2 - dyy, 2 - dxx],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            da1 = t if da1 is None else da1 + t
    # relu1 + BN1 backward: stats over core rows, consumers incl. halo rows;
    # edge-pad rows are constant zeros (see _recompute) — no gradient
    dz1 = jnp.where((r["z1"] > 0) & r["keep"], da1, 0.0)
    du1, ds1, db1 = _bn_bwd_partial(dz1, r["xhat1"], r["rstd1"], s1,
                                    r["in_core"], inv_n)
    ds1_ref[:] += ds1
    db1_ref[:] += db1
    du1b = du1.astype(dtype)
    dw1_ref[:] += jax.lax.dot_general(r["x2_ext"], du1b,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    # dx: core rows via w1^T plus the residual; halo rows emitted as du1
    # (M-wide — the cheap form) for the outside scatter-add
    du1_4d = du1b.reshape(g, th + 2, w, m)
    dx_core = jax.lax.dot_general(
        du1_4d[:, 1:th + 1].reshape(-1, m), w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    dx_ref[:] = (dx_core + dy.astype(dtype)).reshape(g, th, w, c)
    du1lo_ref[:] = du1_4d[:, 0][None]
    du1hi_ref[:] = du1_4d[:, th + 1][None]


# --- pallas_call plumbing ----------------------------------------------------


def _interp(interpret):
    return jax.default_backend() != "tpu" if interpret is None else interpret


def _in_specs(g, th, w, c, m, h):
    vm = pltpu.VMEM
    x_core = pl.BlockSpec((g, th, w, c), lambda i, j: (i, j, 0, 0),
                          memory_space=vm)
    x_lo = pl.BlockSpec((g, 1, w, c),
                        lambda i, j: (i, jnp.maximum(j * th - 1, 0), 0, 0),
                        memory_space=vm)
    x_hi = pl.BlockSpec((g, 1, w, c),
                        lambda i, j: (i, jnp.minimum(j * th + th, h - 1), 0, 0),
                        memory_space=vm)
    const = lambda *s: pl.BlockSpec(s, lambda i, j: (0,) * len(s),
                                    memory_space=vm)
    return ([x_lo, x_core, x_hi, const(c, m), const(3, 3, m, m), const(m, c)]
            + [const(1, m)] * 4 + [const(1, c)] * 2), x_core, const


def _chain_fwd(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, g, th, eps, interpret):
    b, h, w, c = x.shape
    m = w1.shape[1]
    nb, nh = b // g, h // th
    nt = nb * nh
    # block (g, th, w, c) at grid index (i, j) selects batch rows
    # [i*g, (i+1)*g) x image rows [j*th, (j+1)*th): exactly one ghost group
    # x row band — no layout reshape needed on (B, H, W, C)
    specs, x_core_spec, const = _in_specs(g, th, w, c, m, h)
    # stats are (nt, 1, C) with (1, 1, C) blocks — a (1, C) block over a
    # (nt, C) array violates Mosaic's sublane-divisibility rule
    stat = lambda cdim: pl.BlockSpec((1, 1, cdim),
                                     lambda i, j: (i * nh + j, 0, 0),
                                     memory_space=pltpu.VMEM)
    kern = functools.partial(_fwd_kernel, g=g, th=th, w=w, c=c, m=m,
                             eps=eps, nh=nh, dtype=x.dtype)
    f32 = jnp.float32
    out, m1, v1, m2, v2, m3, v3 = pl.pallas_call(
        kern,
        grid=(nb, nh),
        in_specs=specs,
        out_specs=(x_core_spec, stat(m), stat(m), stat(m), stat(m),
                   stat(c), stat(c)),
        out_shape=(jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
                   jax.ShapeDtypeStruct((nt, 1, m), f32),
                   jax.ShapeDtypeStruct((nt, 1, m), f32),
                   jax.ShapeDtypeStruct((nt, 1, m), f32),
                   jax.ShapeDtypeStruct((nt, 1, m), f32),
                   jax.ShapeDtypeStruct((nt, 1, c), f32),
                   jax.ShapeDtypeStruct((nt, 1, c), f32)),
        interpret=_interp(interpret),
    )(x, x, x, w1, w2, w3, s1.reshape(1, m), b1.reshape(1, m),
      s2.reshape(1, m), b2.reshape(1, m), s3.reshape(1, c), b3.reshape(1, c))
    return out, tuple(t.reshape(nt, -1) for t in (m1, v1, m2, v2, m3, v3))


def _chain_bwd_raw(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, dout, g, th, eps,
                   interpret):
    b, h, w, c = x.shape
    m = w1.shape[1]
    nb, nh = b // g, h // th
    nt = nb * nh
    specs, x_core_spec, const = _in_specs(g, th, w, c, m, h)
    halo = pl.BlockSpec((1, g, w, m), lambda i, j: (i * nh + j, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel, g=g, th=th, w=w, c=c, m=m,
                             eps=eps, nh=nh, dtype=x.dtype)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kern,
        grid=(nb, nh),
        in_specs=specs + [x_core_spec],
        out_specs=(x_core_spec, halo, halo,
                   const(c, m), const(3, 3, m, m), const(m, c),
                   const(1, m), const(1, m), const(1, m), const(1, m),
                   const(1, c), const(1, c)),
        out_shape=(jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
                   jax.ShapeDtypeStruct((nt, g, w, m), x.dtype),
                   jax.ShapeDtypeStruct((nt, g, w, m), x.dtype),
                   jax.ShapeDtypeStruct((c, m), f32),
                   jax.ShapeDtypeStruct((3, 3, m, m), f32),
                   jax.ShapeDtypeStruct((m, c), f32),
                   jax.ShapeDtypeStruct((1, m), f32),
                   jax.ShapeDtypeStruct((1, m), f32),
                   jax.ShapeDtypeStruct((1, m), f32),
                   jax.ShapeDtypeStruct((1, m), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32)),
        interpret=_interp(interpret),
    )(x, x, x, w1, w2, w3, s1.reshape(1, m), b1.reshape(1, m),
      s2.reshape(1, m), b2.reshape(1, m), s3.reshape(1, c), b3.reshape(1, c),
      dout)
    (dx, du1lo, du1hi, dw1, dw2, dw3,
     ds1, db1, ds2, db2, ds3, db3) = outs
    # fold the halo rows' input-gradient back in: du1 halo row of tile (i, j)
    # belongs to image row j*th-1 / j*th+th of batch group i (edge tiles'
    # halos were zeroed in-kernel, so adding them is a no-op there)
    halo_lo = (du1lo.reshape(nb, nh, g, w, m) @ w1.T.astype(x.dtype))
    halo_hi = (du1hi.reshape(nb, nh, g, w, m) @ w1.T.astype(x.dtype))
    dxv = dx.reshape(nb, g, nh, th, w, c)
    # lo halo of band j targets band j-1's last row; hi targets band j+1's row 0
    dxv = dxv.at[:, :, :-1, th - 1].add(
        halo_lo[:, 1:].transpose(0, 2, 1, 3, 4))
    dxv = dxv.at[:, :, 1:, 0].add(halo_hi[:, :-1].transpose(0, 2, 1, 3, 4))
    dx = dxv.reshape(b, h, w, c)
    return (dx, dw1, dw2, dw3, ds1.reshape(-1), db1.reshape(-1),
            ds2.reshape(-1), db2.reshape(-1), ds3.reshape(-1),
            db3.reshape(-1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def _chain(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, g, th, eps, interpret):
    return _chain_fwd(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, g, th, eps,
                      interpret)


def _chain_vjp_fwd(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, g, th, eps,
                   interpret):
    out = _chain_fwd(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, g, th, eps,
                     interpret)
    return out, (x, w1, w2, w3, s1, b1, s2, b2, s3, b3)


def _chain_vjp_bwd(g, th, eps, interpret, res, cts):
    dout, _ = cts  # the per-tile stats feed running-stat buffers only
    x, w1, w2, w3, s1, b1, s2, b2, s3, b3 = res
    (dx, dw1, dw2, dw3, ds1, db1, ds2, db2, ds3, db3) = _chain_bwd_raw(
        x, w1, w2, w3, s1, b1, s2, b2, s3, b3, dout, g, th, eps, interpret)
    return (dx, dw1.astype(w1.dtype), dw2.astype(w2.dtype),
            dw3.astype(w3.dtype), ds1.astype(s1.dtype), db1.astype(b1.dtype),
            ds2.astype(s2.dtype), db2.astype(b2.dtype), ds3.astype(s3.dtype),
            db3.astype(b3.dtype))


_chain.defvjp(_chain_vjp_fwd, _chain_vjp_bwd)


# --- mesh-sharded twin -------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def _chain_sharded(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, g, th, eps,
                   interpret, mesh, axis):
    return _chain_sharded_fwd(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, g, th,
                              eps, interpret, mesh, axis)[0]


def _check_batch_shardable(b, g, mesh, axis):
    ndev = mesh.shape[axis]
    if b % (ndev * g):
        raise ValueError(
            f"fused bottleneck under a {ndev}-way '{axis}' mesh needs the "
            f"batch B={b} divisible by ndev*ghost_bn={ndev * g}")


def _chain_sharded_fwd(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, g, th, eps,
                       interpret, mesh, axis):
    from jax.sharding import PartitionSpec as P

    _check_batch_shardable(x.shape[0], g, mesh, axis)

    def fn(x_, *ws):
        return _chain_fwd(x_, *ws, g, th, eps, interpret)

    shmap = jax.shard_map(fn, mesh=mesh,
                          in_specs=(P(axis),) + (P(),) * 9,
                          out_specs=(P(axis), (P(axis),) * 6),
                          check_vma=False)
    out = shmap(x, w1, w2, w3, s1, b1, s2, b2, s3, b3)
    return out, (x, w1, w2, w3, s1, b1, s2, b2, s3, b3)


def _chain_sharded_bwd(g, th, eps, interpret, mesh, axis, res, cts):
    from jax.sharding import PartitionSpec as P

    dout, _ = cts
    x, w1, w2, w3, s1, b1, s2, b2, s3, b3 = res

    def fn(x_, w1_, w2_, w3_, s1_, b1_, s2_, b2_, s3_, b3_, dout_):
        outs = _chain_bwd_raw(x_, w1_, w2_, w3_, s1_, b1_, s2_, b2_, s3_,
                              b3_, dout_, g, th, eps, interpret)
        return (outs[0],) + tuple(o[None] for o in outs[1:])

    shmap = jax.shard_map(fn, mesh=mesh,
                          in_specs=(P(axis),) + (P(),) * 9 + (P(axis),),
                          out_specs=(P(axis),) + (P(axis),) * 9,
                          check_vma=False)
    outs = shmap(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, dout)
    dx = outs[0]
    sums = [jnp.sum(o, axis=0) for o in outs[1:]]
    leaves = (w1, w2, w3, s1, b1, s2, b2, s3, b3)
    return (dx,) + tuple(s.astype(l.dtype) for s, l in zip(sums, leaves))


_chain_sharded.defvjp(_chain_sharded_fwd, _chain_sharded_bwd)


# --- public entry + XLA twin -------------------------------------------------


def fused_chain(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, *, g, th, eps=1e-5,
                interpret=None):
    """One stride-1 identity bottleneck block, fused, tile-local BN stats.

    x: (B, H, W, C); w1: (C, M); w2: (3, 3, M, M); w3: (M, C); BN
    scale/bias pairs per BN (f32). Returns ``(out, (m1, v1, m2, v2, m3,
    v3))`` with per-tile stats of shape (B/g * H/th, M|C) for the running-
    stat update (mean of unbiased tile vars, n = g*th*W). Gate call sites
    with :func:`chain_tile`. Under a declared ops mesh the batch is sharded
    on the data axis and weight grads are summed across shards."""
    ctx = _attn._active_mesh()
    if ctx is not None:
        return _chain_sharded(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, g, th,
                              eps, interpret, *ctx)
    return _chain(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, g, th, eps,
                  interpret)


def fused_bottleneck_chain(block, x, width, out_ch, g, th):
    """Flax glue: declare ConvBN-identical params/stats on ``block``'s scope
    (tree paths ConvBN_{0,1,2}/..., so checkpoints/converters are
    flag-agnostic), run the fused chain, and apply the ghost running-stat
    update (EMA toward the mean of the per-tile stats; unbiased tile var,
    n = g*th*W). Must be called from Bottleneck's compact ``__call__``."""
    from nkbx.models.common import ConvBNParams

    c = x.shape[-1]
    dt = x.dtype
    k1, s1, b1, rm1, rv1 = ConvBNParams(width, 1, name="ConvBN_0")(c)
    k2, s2, b2, rm2, rv2 = ConvBNParams(width, 3, name="ConvBN_1")(width)
    k3, s3, b3, rm3, rv3 = ConvBNParams(out_ch, 1, name="ConvBN_2")(width)
    out, stats = fused_chain(
        x,
        k1.reshape(c, width).astype(dt), k2.astype(dt),
        k3.reshape(width, out_ch).astype(dt),
        s1, b1, s2, b2, s3, b3, g=g, th=th)
    m1, v1, m2, v2, m3, v3 = stats
    mom = 0.9  # ConvBN default bn_momentum
    n = g * th * x.shape[2]
    unb = n / max(n - 1.0, 1.0)
    for ra_m, ra_v, mu, var in ((rm1, rv1, m1, v1), (rm2, rv2, m2, v2),
                                (rm3, rv3, m3, v3)):
        mu_b = jnp.mean(jax.lax.stop_gradient(mu), axis=0)
        var_b = jnp.mean(jax.lax.stop_gradient(var), axis=0) * unb
        ra_m.value = mom * ra_m.value + (1.0 - mom) * mu_b
        ra_v.value = mom * ra_v.value + (1.0 - mom) * var_b
    return out


def reference_chain(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, *, g, th,
                    eps=1e-5):
    """Plain-XLA twin with the SAME tile-local stats semantics (equality
    tests; also the documentation of exactly what the fused semantics are).

    Tiles the batch into ghost groups of g and the image rows into bands of
    th; BN stats per (group, band) tile over core rows; the conv3x3 halo
    rows are normalized with the OWNING tile's stats (recomputed per tile)."""
    b, h, w, c = x.shape
    m = w1.shape[1]
    nb, nh = b // g, h // th
    f32 = jnp.float32
    dt = x.dtype

    w1f, w2f, w3f = (t.astype(dt) for t in (w1, w2, w3))

    def tile(xt_ext, has_lo, has_hi):
        """xt_ext: (g, th+2, W, C) with halo rows (zeros at edges)."""
        u1 = (xt_ext.reshape(-1, c) @ w1f).astype(f32)
        hidx = np.arange(g * (th + 2) * w) // w % (th + 2)
        in_core = jnp.asarray(((hidx >= 1) & (hidx <= th))[:, None])
        n = g * th * w
        uc = jnp.where(in_core, u1, 0.0)
        mu1 = jnp.sum(uc, 0, keepdims=True) / n
        var1 = jnp.maximum(jnp.sum(uc * u1, 0, keepdims=True) / n
                           - mu1 * mu1, 0.0)
        xhat1 = (u1 - mu1) * jax.lax.rsqrt(var1 + eps)
        a1 = jnp.maximum(xhat1 * s1 + b1, 0).astype(dt)
        a1 = a1.reshape(g, th + 2, w, m)
        # image-edge halo rows are the conv's ZERO padding in the
        # activation domain (bn(0) != 0)
        if not has_lo:
            a1 = a1.at[:, 0].set(0.0)
        if not has_hi:
            a1 = a1.at[:, th + 1].set(0.0)
        u2 = jax.lax.conv_general_dilated(
            a1, w2f, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(f32)
        u2 = u2.reshape(-1, m)
        mu2 = jnp.mean(u2, 0, keepdims=True)
        var2 = jnp.maximum(jnp.mean(u2 * u2, 0, keepdims=True)
                           - mu2 * mu2, 0.0)
        xhat2 = (u2 - mu2) * jax.lax.rsqrt(var2 + eps)
        a2 = jnp.maximum(xhat2 * s2 + b2, 0).astype(dt)
        u3 = (a2 @ w3f).astype(f32)
        mu3 = jnp.mean(u3, 0, keepdims=True)
        var3 = jnp.maximum(jnp.mean(u3 * u3, 0, keepdims=True)
                           - mu3 * mu3, 0.0)
        xhat3 = (u3 - mu3) * jax.lax.rsqrt(var3 + eps)
        y3 = (xhat3 * s3 + b3).astype(dt)
        return y3, (mu1, var1, mu2, var2, mu3, var3)

    outs = jnp.zeros_like(x)
    stats = [[] for _ in range(6)]
    for i in range(nb):
        for j in range(nh):
            xt = x[i * g:(i + 1) * g]
            lo = (xt[:, j * th - 1:j * th] if j > 0
                  else jnp.zeros((g, 1, w, c), dt))
            hi = (xt[:, (j + 1) * th:(j + 1) * th + 1] if j < nh - 1
                  else jnp.zeros((g, 1, w, c), dt))
            xt_ext = jnp.concatenate([lo, xt[:, j * th:(j + 1) * th], hi], 1)
            y3, st = tile(xt_ext, j > 0, j < nh - 1)
            core = xt[:, j * th:(j + 1) * th].reshape(-1, c)
            out_t = jnp.maximum(y3 + core, 0).reshape(g, th, w, c)
            outs = outs.at[i * g:(i + 1) * g, j * th:(j + 1) * th].set(out_t)
            for k in range(6):
                stats[k].append(st[k])
    return outs, tuple(jnp.concatenate(s, 0) for s in stats)
