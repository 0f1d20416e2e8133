"""Fused MLP (Dense -> exact GELU -> Dense) Pallas kernel.

Motivation (round-3 convnext attribution, PERF.md): the two mixing Denses
dominate the ConvNeXt train step — 31.6 of 50 ms against a ~12.8 ms MXU
bound — because XLA materializes the (rows, 4C) pre-GELU and post-GELU
intermediates in HBM for the backward (2 x 147 MB per stage-1 block at
bs=64 @224). The same structure exists in every transformer MLP in the zoo
(vit.py:75-79, swin.py:168-172; all use exact GELU, matching timm).

This kernel computes ``y = gelu(x @ w0 + b0) @ w1 + b1`` tile-by-tile in
VMEM: forward reads x and writes y only — the (rows, F) intermediates never
touch HBM. The backward (custom VJP) re-computes u = x@w0+b0 and g=gelu(u)
per row tile (flash-attention-style recompute: ~1 extra matmul unit on the
otherwise idle MXU) and accumulates dw0/dw1/db0/db1 in resident f32 VMEM
buffers across the row grid, so backward traffic is x, dy in / dx out.

Numerics: matmuls accumulate in f32 (``preferred_element_type``) and the
GELU and its derivative are evaluated in f32; the XLA path rounds u to the
compute dtype before the GELU, so the kernel is slightly MORE precise in
bf16 mode and bit-comparable in f32 mode (same story as
nkbx/ops/attention.py).

VMEM sizing: the single-kernel backward keeps w0, w1 (compute dtype) and
dw0, dw1 (f32) resident — 12 (C·F) bytes in bf16 — which fits the ~16 MB
VMEM for C ≤ 384 at mlp_ratio 4 (ConvNeXt/Swin stages 1-3, exactly where
the traffic lives). ``fused_mlp_viable`` gates call sites; larger layers
stay on XLA. That VMEM boundary coincides with the PROFITABILITY
boundary: the XLA intermediates' traffic time equals the MLP's MXU time
at C ≈ 284 (4·F·itemsize/BW vs 12·C·F/peak at delivered 462 GB/s /
197 TFLOP/s) — below it the MLP is intermediate-traffic-bound and fusing
wins; at C = 768 (ViT-B, stage 4) the MLP is already MXU-bound and the
kernel's flash-style recompute (+~50% MLP matmul work) would cost more
than the saved bytes. Don't chase an F-chunked C=768 variant without new
evidence. Row counts need not divide the tile — the final partial tile is
masked (padded rows zeroed before any accumulation), so ViT's B·197 token
rows work.

Mesh: ``pallas_call`` has no GSPMD partitioning rule, so under a declared
multi-device mesh (nkbx.ops.attention.set_attention_mesh — shared ops-mesh
state) the kernel runs per-shard inside ``jax.shard_map``, rows sharded on
the data axis; dw/db are summed across shards outside the map (same
pattern as the fused-attention bias gradient).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nkbx.ops import attention as _attn

_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327

# XLA's f32 erf rational approximation (openxla math.cc ErfImpl32): Mosaic
# has no erf primitive, and this is bit-wise what lax.erf lowers to for f32
# on TPU — so the kernel's "exact" GELU matches the XLA path's.
_ERF_ALPHA = (0.00022905065861350646, 0.0034082910107109506,
              0.050955695062380861, 0.18520832239976145, 1.128379143519084)
_ERF_BETA = (-1.1791602954361697e-7, 2.3547966471313185e-5,
             0.0010179625278914885, 0.014070470171167667,
             0.11098505178285362, 0.49746925110067538, 1.0)


# 1/q via approximate reciprocal + two Newton steps; measured ~2.3 ms/step
# cheaper than the hardware divide across convnext_tiny's fused MLPs
# (experiments/r3_gelu_headroom.py). Shared with the attention kernels.
_recip_f32 = _attn.recip_f32


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + c
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + c
    return x * p * _recip_f32(q)


def _gelu_f32(u):
    """Exact GELU, f32 in / f32 out (timm semantics, approximate=False)."""
    return 0.5 * u * (1.0 + _erf_f32(u * _SQRT_HALF))


def _gelu_and_grad_f32(u):
    """(gelu(u), gelu'(u)) sharing ONE erf evaluation — the kernels are
    VPU-transcendental-bound (PERF.md r3 post-fusion profile), so the
    backward computes the CDF once for both the recomputed activation and
    its derivative Phi(u) + u*phi(u)."""
    cdf = 0.5 * (1.0 + _erf_f32(u * _SQRT_HALF))
    pdf = jnp.exp(-0.5 * u * u) * _INV_SQRT_2PI
    return u * cdf, cdf + u * pdf


_VMEM_BUDGET = 12_000_000  # bytes; ~16 MB VMEM minus head-room for Mosaic
                           # temporaries and double-buffered row streams.


def _pad(x, t):
    return -(-x // t) * t


def _resident_bytes(c, f, itemsize, bwd):
    """VMEM held across the whole grid (weights + f32 grad accumulators)."""
    # (C, F) pads sublane-C/lane-F; (F, C) the transpose — NOT the same total
    # when only one of C, F is a multiple of 128 (e.g. fractional mlp_ratio).
    cf = _pad(c, 8) * _pad(f, 128) + _pad(f, 8) * _pad(c, 128)
    w = cf * itemsize
    if bwd:
        w += cf * 4 + (_pad(f, 128) + _pad(c, 128)) * 8 * 4
    return w


def _per_row_bytes(c, f, itemsize, bwd, ln=False):
    """Per-row VMEM: streamed tiles (double-buffered) + f32 intermediates."""
    streams = (3 if bwd else 1) * _pad(c, 128) * itemsize + _pad(c, 128) * itemsize
    inter = _pad(f, 128) * (4 + itemsize) + (_pad(f, 128) * 4 if bwd else 0)
    if ln:
        # extra stream (shortcut / dout) + f32 xf/xhat/h intermediates
        streams += _pad(c, 128) * itemsize
        inter += _pad(c, 128) * (4 + 4 + itemsize)
    return 2 * streams + inter


def _pick_rows(r, c, f, itemsize, bwd, ln=False):
    """Row tile ≤ cap (multiple of 8, ≥128), or None.

    Prefers a tile that divides r exactly (no boundary masking); otherwise
    the largest aligned tile — the kernels mask the final partial tile
    (rows beyond r are zeroed before any accumulation), so any row count
    ≥128 works (e.g. ViT's B·197 token rows)."""
    budget = _VMEM_BUDGET - _resident_bytes(c, f, itemsize, bwd)
    if budget <= 0:
        return None
    cap = min(1024, budget // _per_row_bytes(c, f, itemsize, bwd, ln), r)
    cap -= cap % 8
    if cap < 128:
        return None
    for tr in range(cap, 127, -8):
        if r % tr == 0:
            return tr
    return cap


def fused_mlp_viable(rows: int, c: int, f: int, itemsize: int = 2,
                     ln: bool = False) -> bool:
    """True when the fused kernel (incl. its backward) fits this geometry.

    ``ln=True`` sizes the LN-fused variant (:func:`fused_ln_mlp`), which
    streams one extra (rows, C) operand and keeps f32 LN intermediates."""
    return (_pick_rows(rows, c, f, itemsize, bwd=True, ln=ln) is not None
            and _pick_rows(rows, c, f, itemsize, bwd=False, ln=ln) is not None)


def resolve_fused_mlp(flag, auto: bool) -> bool:
    """Trace-time resolution of a model's fused-mlp flag.

    Precedence mirrors nkbx.ops.attention.resolve_fused: the export
    disable_fused() context > ``NKBX_FUSED_MLP=0|1`` env override > the
    module flag (True/False) > ``auto`` (the family's measured default)."""
    if _attn.fused_force_disabled():
        return False
    env = os.environ.get("NKBX_FUSED_MLP", "")
    if env:
        return env not in ("0", "false", "False")
    if flag is not None:
        return bool(flag)
    return auto


def _gate_rows(rows):
    """Rows each kernel invocation actually sees: under a declared ops mesh
    the kernel runs per-shard on rows/ndev (see the Mesh note in the module
    docstring), so the viability gate must size THAT geometry — a globally
    viable row count can be per-shard non-tileable. Returns None when the
    rows don't divide the axis (the sharded entry would raise) or when the
    caller couldn't produce a static count (symbolic export shapes).

    Row divisibility is a PROXY for batch shardability (same contract as
    the sharded entries' _check_rows_shardable): if the batch itself does
    not divide the axis but B·H·W does, the kernel still runs correctly —
    GSPMD reshards the batch-sharded activation into row shards around it —
    at a collective cost. The shipped convention (CLAUDE.md) keeps per-chip
    batches divisible, where row sharding coincides with batch sharding."""
    if rows is None:
        return None
    ctx = _attn._active_mesh()
    if ctx is None:
        return rows
    mesh, axis = ctx
    ndev = mesh.shape[axis]
    if rows % ndev:
        return None
    return rows // ndev


def use_fused_mlp(flag, rows, c, f, itemsize, auto=None):
    """Shared model-level gate: flag resolution AND VMEM/geometry viability.

    ``auto=None`` defaults to "on TPU" — the measured default for every
    family wired so far (ConvNeXt +26%, Swin; PERF.md round 3). Call sites
    pass the flattened GLOBAL row count; the gate accounts for the active
    ops mesh (per-shard rows) so non-tileable or non-shardable geometries
    (e.g. ViT's B·197 token rows) fall back to XLA automatically."""
    return fused_mlp_mode(flag, rows, c, f, itemsize, auto) is not None


def fused_mlp_mode(flag, rows, c, f, itemsize, auto=None):
    """Resolve a block's MLP lowering: ``"ln"`` (LN+MLP+residual fused,
    :func:`fused_ln_mlp`), ``"mlp"`` (MLP-only, :func:`fused_mlp`), or
    ``None`` (plain XLA).

    Prefers the LN-fused kernel where its (slightly larger) VMEM footprint
    fits; ``NKBX_FUSED_LN_MLP=0`` drops back to the MLP-only kernel for
    A/B measurements without disabling fusion entirely."""
    if auto is None:
        auto = jax.default_backend() == "tpu"
    if not resolve_fused_mlp(flag, auto):
        return None
    rows = _gate_rows(rows)  # per-shard rows under a mesh; None = XLA path
    if rows is None or not fused_mlp_viable(rows, c, f, itemsize):
        return None
    ln_ok = (fused_mlp_viable(rows, c, f, itemsize, ln=True)
             and os.environ.get("NKBX_FUSED_LN_MLP", "")
             not in ("0", "false", "False"))
    return "ln" if ln_ok else "mlp"


# --- kernels -----------------------------------------------------------------


def _row_mask(rows, tr):
    """(tr, 1) bool mask of valid rows in this grid step, or None when the
    grid divides evenly (loads beyond the array edge are undefined — they
    must be zeroed before any cross-row accumulation)."""
    if rows % tr == 0:
        return None
    left = rows - pl.program_id(0) * tr
    return jax.lax.broadcasted_iota(jnp.int32, (tr, 1), 0) < left


def _fwd_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, y_ref, *,
                out_dtype, rows, tr):
    x = x_ref[:]
    mask = _row_mask(rows, tr)
    if mask is not None:
        x = jnp.where(mask, x, 0)  # keep padded rows finite (store is clipped)
    u = jax.lax.dot_general(x, w0_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u + b0_ref[:].astype(jnp.float32)
    g = _gelu_f32(u).astype(out_dtype)
    y = jax.lax.dot_general(g, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y_ref[:] = (y + b1_ref[:].astype(jnp.float32)).astype(out_dtype)


def _bwd_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, dy_ref,
                dx_ref, dw0_ref, db0_ref, dw1_ref, db1_ref, *,
                out_dtype, rows, tr):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw0_ref[:] = jnp.zeros_like(dw0_ref)
        db0_ref[:] = jnp.zeros_like(db0_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)

    x = x_ref[:]
    dy = dy_ref[:]
    mask = _row_mask(rows, tr)
    if mask is not None:
        # zero BOTH streams: padded rows then contribute exact zeros to
        # every dW/db accumulation (and u stays finite, so du = 0 * gelu'(u)
        # cannot produce NaN).
        x = jnp.where(mask, x, 0)
        dy = jnp.where(mask, dy, 0)
    # recompute the forward intermediates for this row tile (never stored)
    u = jax.lax.dot_general(x, w0_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u + b0_ref[:].astype(jnp.float32)
    gf, ggrad = _gelu_and_grad_f32(u)
    g = gf.astype(out_dtype)
    # second-dense grads: dw1 += gᵀ dy, db1 += Σ dy
    dw1_ref[:] += jax.lax.dot_general(g, dy, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    # through the GELU: du = (dy w1ᵀ) ∘ gelu'(u)
    dg = jax.lax.dot_general(dy, w1_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    du = dg * ggrad
    dub = du.astype(out_dtype)
    # first-dense grads and dx
    dw0_ref[:] += jax.lax.dot_general(x, dub, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db0_ref[:] += jnp.sum(du, axis=0, keepdims=True)
    dx_ref[:] = jax.lax.dot_general(
        dub, w0_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


# --- pallas_call plumbing ----------------------------------------------------


def _specs(tr, c, f):
    row = lambda last: pl.BlockSpec((tr, last), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    const = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    return row(c), const(c, f), const(1, f), const(f, c), const(1, c)


def _interp(interpret):
    return jax.default_backend() != "tpu" if interpret is None else interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused2d(x, w0, b0, w1, b1, interpret=None):
    return _fwd(x, w0, b0, w1, b1, interpret)


def _no_tile(r, c, f):
    raise ValueError(
        f"fused_mlp: no viable row tile for rows={r}, C={c}, F={f} — gate "
        f"call sites with fused_mlp_viable()")


def _fwd(x, w0, b0, w1, b1, interpret):
    r, c = x.shape
    f = w0.shape[1]
    tr = _pick_rows(r, c, f, x.dtype.itemsize, bwd=False) or _no_tile(r, c, f)
    xspec, w0s, b0s, w1s, b1s = _specs(tr, c, f)
    kern = functools.partial(_fwd_kernel, out_dtype=x.dtype, rows=r, tr=tr)
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(r, tr),),
        in_specs=[xspec, w0s, b0s, w1s, b1s],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=_interp(interpret),
    )(x, w0, b0.reshape(1, f), w1, b1.reshape(1, c))


def _vjp_fwd(x, w0, b0, w1, b1, interpret):
    return _fwd(x, w0, b0, w1, b1, interpret), (x, w0, b0, w1, b1)


def _bwd_raw(x, w0, b0, w1, b1, dy, interpret):
    """(dx, dw0_f32, db0_f32, dw1_f32, db1_f32) for one (per-shard) block."""
    r, c = x.shape
    f = w0.shape[1]
    tr = _pick_rows(r, c, f, x.dtype.itemsize, bwd=True) or _no_tile(r, c, f)
    xspec, w0s, b0s, w1s, b1s = _specs(tr, c, f)
    kern = functools.partial(_bwd_kernel, out_dtype=x.dtype, rows=r, tr=tr)
    f32 = jnp.float32
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(r, tr),),
        in_specs=[xspec, w0s, b0s, w1s, b1s, xspec],
        out_specs=(xspec,
                   pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((f, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((r, c), x.dtype),
                   jax.ShapeDtypeStruct((c, f), f32),
                   jax.ShapeDtypeStruct((1, f), f32),
                   jax.ShapeDtypeStruct((f, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32)),
        interpret=_interp(interpret),
    )(x, w0, b0.reshape(1, f), w1, b1.reshape(1, c), dy)


def _vjp_bwd(interpret, res, dy):
    x, w0, b0, w1, b1 = res
    dx, dw0, db0, dw1, db1 = _bwd_raw(x, w0, b0, w1, b1, dy, interpret)
    return (dx, dw0.astype(w0.dtype), db0.reshape(b0.shape).astype(b0.dtype),
            dw1.astype(w1.dtype), db1.reshape(b1.shape).astype(b1.dtype))


_fused2d.defvjp(_vjp_fwd, _vjp_bwd)


# --- mesh-sharded twin (see nkbx.ops.attention.set_attention_mesh) ----------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused2d_sharded(x, w0, b0, w1, b1, interpret, mesh, axis):
    return _sharded_fwd(x, w0, b0, w1, b1, interpret, mesh, axis)[0]


def _check_rows_shardable(r, mesh, axis):
    ndev = mesh.shape[axis]
    if r % ndev:
        raise ValueError(
            f"fused MLP under a {ndev}-way '{axis}' mesh needs the row count "
            f"R={r} divisible by the axis size")


def _sharded_fwd(x, w0, b0, w1, b1, interpret, mesh, axis):
    from jax.sharding import PartitionSpec as P

    _check_rows_shardable(x.shape[0], mesh, axis)

    def fn(x_, w0_, b0_, w1_, b1_):
        return _fwd(x_, w0_, b0_, w1_, b1_, interpret)

    shmap = jax.shard_map(fn, mesh=mesh,
                          in_specs=(P(axis), P(), P(), P(), P()),
                          out_specs=P(axis), check_vma=False)
    return shmap(x, w0, b0, w1, b1), (x, w0, b0, w1, b1)


def _sharded_bwd(interpret, mesh, axis, res, dy):
    from jax.sharding import PartitionSpec as P

    x, w0, b0, w1, b1 = res

    def fn(x_, w0_, b0_, w1_, b1_, dy_):
        dx, dw0, db0, dw1, db1 = _bwd_raw(x_, w0_, b0_, w1_, b1_, dy_, interpret)
        return dx, dw0[None], db0[None], dw1[None], db1[None]

    shmap = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False)
    dx, dw0, db0, dw1, db1 = shmap(x, w0, b0, w1, b1, dy)
    return (dx,
            jnp.sum(dw0, axis=0).astype(w0.dtype),
            jnp.sum(db0, axis=0).reshape(b0.shape).astype(b0.dtype),
            jnp.sum(dw1, axis=0).astype(w1.dtype),
            jnp.sum(db1, axis=0).reshape(b1.shape).astype(b1.dtype))


_fused2d_sharded.defvjp(_sharded_fwd, _sharded_bwd)


# --- public entry points -----------------------------------------------------


def fused_mlp(x, w0, b0, w1, b1, interpret=None):
    """``gelu(x @ w0 + b0, exact) @ w1 + b1`` fused in VMEM.

    x: (..., C); w0: (C, F); b0: (F,); w1: (F, C); b1: (C,). Weights are
    expected pre-cast to the compute dtype (biases may stay f32 — they are
    consumed in f32 inside the kernel). Leading dims are flattened to rows;
    under a declared multi-device ops mesh the rows are sharded on the data
    axis (leading-dim-major, so a batch-sharded NHWC tensor shards
    consistently). Gate call sites with :func:`fused_mlp_viable`.
    """
    c = x.shape[-1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, c)
    ctx = _attn._active_mesh()
    if ctx is not None:
        y = _fused2d_sharded(x2, w0, b0, w1, b1, interpret, *ctx)
    else:
        y = _fused2d(x2, w0, b0, w1, b1, interpret)
    return y.reshape(*lead, c)


def reference_mlp(x, w0, b0, w1, b1):
    """Plain-XLA twin (flax-Dense semantics: bias added in compute dtype) —
    used by the equality tests and as the fallback path shape reference."""
    dt = x.dtype
    u = x @ w0 + b0.astype(dt)
    g = jax.nn.gelu(u, approximate=False)
    return g @ w1 + b1.astype(dt)


# --- LN-fused variant: shortcut + gamma * MLP(LN(x)) --------------------------
#
# Absorbs the whole transformer-block MLP half into ONE kernel per pass:
# the post-fusion convnext/swin profiles (experiments/r3_postfusion_profile)
# show the remaining per-block cost is LayerNorm — its lane-dim stat
# reductions force {0,2,1} relayout copies, and LN fwd/bwd plus the
# layer-scale and residual fusions each make full (rows, C) HBM round
# trips. Computing LN per row tile in VMEM (f32 stats, flax fast-variance
# semantics) eliminates all of them: forward reads x + shortcut and writes
# out; backward re-derives everything tile-wise and emits dx plus
# C-sized dscale/dbias/dgamma from resident f32 accumulators.


def _ln_f32(x_ref, s_ref, b_ref, eps, mask):
    """flax LayerNorm (fast variance) in f32: returns (xhat, h, rstd)."""
    xf = x_ref[:].astype(jnp.float32)
    if mask is not None:
        xf = jnp.where(mask, xf, 0)
    inv_c = 1.0 / x_ref.shape[1]
    mu = jnp.sum(xf, axis=1, keepdims=True) * inv_c
    var = jnp.maximum(jnp.sum(xf * xf, axis=1, keepdims=True) * inv_c - mu * mu, 0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    return xhat, xhat * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32), rstd


def _lnmlp_fwd_kernel(x_ref, s_ref, b_ref, w0_ref, b0_ref, w1_ref, b1_ref,
                      g_ref, sc_ref, y_ref, *, out_dtype, rows, tr, eps):
    mask = _row_mask(rows, tr)
    _, h, _ = _ln_f32(x_ref, s_ref, b_ref, eps, mask)
    h = h.astype(out_dtype)
    u = jax.lax.dot_general(h, w0_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u + b0_ref[:].astype(jnp.float32)
    g = _gelu_f32(u).astype(out_dtype)
    y = jax.lax.dot_general(g, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = (y + b1_ref[:].astype(jnp.float32)).astype(out_dtype)
    # mirror the XLA program's dtype staging: bf16 y * bf16 gamma + bf16 x
    y_ref[:] = sc_ref[:] + y * g_ref[:].astype(out_dtype)


def _lnmlp_bwd_kernel(x_ref, s_ref, b_ref, w0_ref, b0_ref, w1_ref, b1_ref,
                      g_ref, dy_ref,
                      dx_ref, ds_ref, db_ref, dw0_ref, db0_ref, dw1_ref,
                      db1_ref, dg_ref, *, out_dtype, rows, tr, eps):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (ds_ref, db_ref, dw0_ref, db0_ref, dw1_ref, db1_ref, dg_ref):
            ref[:] = jnp.zeros_like(ref)

    mask = _row_mask(rows, tr)
    dout = dy_ref[:]
    if mask is not None:
        dout = jnp.where(mask, dout, 0)
    scale = s_ref[:].astype(jnp.float32)
    # recompute the forward for this row tile (never stored)
    xhat, h, rstd = _ln_f32(x_ref, s_ref, b_ref, eps, mask)
    h = h.astype(out_dtype)
    u = jax.lax.dot_general(h, w0_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u + b0_ref[:].astype(jnp.float32)
    gf, ggrad = _gelu_and_grad_f32(u)
    g = gf.astype(out_dtype)
    y = jax.lax.dot_general(g, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = (y + b1_ref[:].astype(jnp.float32)).astype(out_dtype)
    # layer-scale: dgamma += sum(dout * y); dy2 = dout * gamma (bf16 like fwd)
    dg_ref[:] += jnp.sum((dout * y).astype(jnp.float32), axis=0, keepdims=True)
    dy2 = dout * g_ref[:].astype(out_dtype)
    # second dense
    dw1_ref[:] += jax.lax.dot_general(g, dy2, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dy2.astype(jnp.float32), axis=0, keepdims=True)
    # through the GELU
    dgl = jax.lax.dot_general(dy2, w1_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    du = dgl * ggrad
    dub = du.astype(out_dtype)
    # first dense
    dw0_ref[:] += jax.lax.dot_general(h, dub, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db0_ref[:] += jnp.sum(du, axis=0, keepdims=True)
    dh = jax.lax.dot_general(dub, w0_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # LayerNorm backward (dh is f32)
    ds_ref[:] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dh, axis=0, keepdims=True)
    dxhat = dh * scale
    inv_c = 1.0 / x_ref.shape[1]
    m1 = jnp.sum(dxhat, axis=1, keepdims=True) * inv_c
    m2 = jnp.sum(dxhat * xhat, axis=1, keepdims=True) * inv_c
    dx_ref[:] = (rstd * (dxhat - m1 - xhat * m2)).astype(out_dtype)


def _ln_specs(tr, c, f):
    row = pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_f = pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat0 = pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat1 = pl.BlockSpec((f, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return row, vec_c, vec_f, mat0, mat1


def _lnmlp_fwd(x, s, b, w0, b0, w1, b1, gamma, sc, interpret, eps):
    r, c = x.shape
    f = w0.shape[1]
    tr = (_pick_rows(r, c, f, x.dtype.itemsize, bwd=False, ln=True)
          or _no_tile(r, c, f))
    row, vec_c, vec_f, mat0, mat1 = _ln_specs(tr, c, f)
    kern = functools.partial(_lnmlp_fwd_kernel, out_dtype=x.dtype,
                             rows=r, tr=tr, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(r, tr),),
        in_specs=[row, vec_c, vec_c, mat0, vec_f, mat1, vec_c, vec_c, row],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=_interp(interpret),
    )(x, s.reshape(1, c), b.reshape(1, c), w0, b0.reshape(1, f), w1,
      b1.reshape(1, c), gamma.reshape(1, c), sc)


def _lnmlp_bwd_raw(x, s, b, w0, b0, w1, b1, gamma, dy, interpret, eps):
    r, c = x.shape
    f = w0.shape[1]
    tr = (_pick_rows(r, c, f, x.dtype.itemsize, bwd=True, ln=True)
          or _no_tile(r, c, f))
    row, vec_c, vec_f, mat0, mat1 = _ln_specs(tr, c, f)
    kern = functools.partial(_lnmlp_bwd_kernel, out_dtype=x.dtype,
                             rows=r, tr=tr, eps=eps)
    f32 = jnp.float32
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(r, tr),),
        in_specs=[row, vec_c, vec_c, mat0, vec_f, mat1, vec_c, vec_c, row],
        out_specs=(row, vec_c, vec_c, mat0, vec_f, mat1, vec_c, vec_c),
        out_shape=(jax.ShapeDtypeStruct((r, c), x.dtype),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((c, f), f32),
                   jax.ShapeDtypeStruct((1, f), f32),
                   jax.ShapeDtypeStruct((f, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32)),
        interpret=_interp(interpret),
    )(x, s.reshape(1, c), b.reshape(1, c), w0, b0.reshape(1, f), w1,
      b1.reshape(1, c), gamma.reshape(1, c), dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _lnmlp2d(x, s, b, w0, b0, w1, b1, gamma, sc, interpret, eps):
    return _lnmlp_fwd(x, s, b, w0, b0, w1, b1, gamma, sc, interpret, eps)


def _lnmlp_vjp_fwd(x, s, b, w0, b0, w1, b1, gamma, sc, interpret, eps):
    out = _lnmlp_fwd(x, s, b, w0, b0, w1, b1, gamma, sc, interpret, eps)
    return out, (x, s, b, w0, b0, w1, b1, gamma)


def _lnmlp_vjp_bwd(interpret, eps, res, dy):
    x, s, b, w0, b0, w1, b1, gamma = res
    dx, ds, db, dw0, db0, dw1, db1, dgamma = _lnmlp_bwd_raw(
        x, s, b, w0, b0, w1, b1, gamma, dy, interpret, eps)
    return (dx, ds.reshape(s.shape).astype(s.dtype),
            db.reshape(b.shape).astype(b.dtype),
            dw0.astype(w0.dtype), db0.reshape(b0.shape).astype(b0.dtype),
            dw1.astype(w1.dtype), db1.reshape(b1.shape).astype(b1.dtype),
            dgamma.reshape(gamma.shape).astype(gamma.dtype),
            dy)  # d(shortcut): identity pass-through


_lnmlp2d.defvjp(_lnmlp_vjp_fwd, _lnmlp_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _lnmlp2d_sharded(x, s, b, w0, b0, w1, b1, gamma, sc, interpret, eps,
                     mesh, axis):
    return _lnmlp_sharded_fwd(x, s, b, w0, b0, w1, b1, gamma, sc,
                              interpret, eps, mesh, axis)[0]


def _lnmlp_sharded_fwd(x, s, b, w0, b0, w1, b1, gamma, sc, interpret, eps,
                       mesh, axis):
    from jax.sharding import PartitionSpec as P

    _check_rows_shardable(x.shape[0], mesh, axis)

    def fn(x_, s_, b_, w0_, b0_, w1_, b1_, g_, sc_):
        return _lnmlp_fwd(x_, s_, b_, w0_, b0_, w1_, b1_, g_, sc_,
                          interpret, eps)

    shmap = jax.shard_map(fn, mesh=mesh,
                          in_specs=(P(axis),) + (P(),) * 7 + (P(axis),),
                          out_specs=P(axis), check_vma=False)
    return shmap(x, s, b, w0, b0, w1, b1, gamma, sc), (x, s, b, w0, b0, w1,
                                                       b1, gamma)


def _lnmlp_sharded_bwd(interpret, eps, mesh, axis, res, dy):
    from jax.sharding import PartitionSpec as P

    x, s, b, w0, b0, w1, b1, gamma = res

    def fn(x_, s_, b_, w0_, b0_, w1_, b1_, g_, dy_):
        outs = _lnmlp_bwd_raw(x_, s_, b_, w0_, b0_, w1_, b1_, g_, dy_,
                              interpret, eps)
        return (outs[0],) + tuple(o[None] for o in outs[1:])

    shmap = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis),) + (P(),) * 7 + (P(axis),),
        out_specs=(P(axis),) + (P(axis),) * 7, check_vma=False)
    dx, ds, db, dw0, db0, dw1, db1, dgamma = shmap(
        x, s, b, w0, b0, w1, b1, gamma, dy)
    return (dx,
            jnp.sum(ds, axis=0).reshape(s.shape).astype(s.dtype),
            jnp.sum(db, axis=0).reshape(b.shape).astype(b.dtype),
            jnp.sum(dw0, axis=0).astype(w0.dtype),
            jnp.sum(db0, axis=0).reshape(b0.shape).astype(b0.dtype),
            jnp.sum(dw1, axis=0).astype(w1.dtype),
            jnp.sum(db1, axis=0).reshape(b1.shape).astype(b1.dtype),
            jnp.sum(dgamma, axis=0).reshape(gamma.shape).astype(gamma.dtype),
            dy)


_lnmlp2d_sharded.defvjp(_lnmlp_sharded_fwd, _lnmlp_sharded_bwd)


def fused_ln_mlp(x, ln_scale, ln_bias, w0, b0, w1, b1, shortcut,
                 gamma=None, eps=1e-6, interpret=None):
    """``shortcut + gamma * MLP(LayerNorm(x))`` fused in VMEM.

    The transformer-block MLP half as ONE kernel per pass: LayerNorm (flax
    fast-variance semantics, f32 stats), Dense -> exact GELU -> Dense (f32
    accumulation), optional layer-scale ``gamma`` (ConvNeXt), residual add.
    Forward reads x and shortcut and writes the block output only; the
    backward recomputes everything per row tile and returns dx plus
    parameter grads from resident f32 VMEM accumulators (d(shortcut) is
    the incoming cotangent, passed through for free).

    x/shortcut: (..., C) — for a self-residual block (Swin) pass the same
    array as both; JAX sums the two cotangents automatically. gamma: (C,)
    layer-scale or None (identity — bf16 multiply by 1 is exact).
    Gate call sites with ``fused_mlp_viable(..., ln=True)``.
    """
    c = x.shape[-1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, c)
    sc2 = shortcut.reshape(-1, c)
    if gamma is None:
        gamma = jnp.ones((c,), jnp.float32)
    ctx = _attn._active_mesh()
    if ctx is not None:
        y = _lnmlp2d_sharded(x2, ln_scale, ln_bias, w0, b0, w1, b1, gamma,
                             sc2, interpret, eps, *ctx)
    else:
        y = _lnmlp2d(x2, ln_scale, ln_bias, w0, b0, w1, b1, gamma, sc2,
                     interpret, eps)
    return y.reshape(*lead, c)


def reference_ln_mlp(x, ln_scale, ln_bias, w0, b0, w1, b1, shortcut,
                     gamma=None, eps=1e-6):
    """Plain-XLA twin with flax LayerNorm/Dense dtype staging (equality
    tests + fallback shape reference)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)
         * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    y = reference_mlp(h.astype(dt), w0, b0, w1, b1)
    if gamma is not None:
        y = y * gamma.astype(dt)
    return shortcut + y
