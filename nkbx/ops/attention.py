"""Fused (flash-style) attention Pallas kernel for short sequences.

Covers the two attention shapes in the zoo — Swin window attention
(N = window² = 49 tokens, relative-position bias + shift mask) and ViT full
attention (N ≤ 257 tokens, no bias) — replacing the XLA lowering that
materializes the (groups, heads, N, N) score/probability tensors in HBM.

Why a kernel here and not for the CNNs (where Pallas measured as a loss,
see PERF.md): XLA cannot fuse a dot's producer chain across a softmax, so
the standard attention program writes the f32 score tensor to HBM at least
once forward (padded 49 → 128 lanes on TPU, ~2.6× waste for Swin) and
several more times backward (probs, dP, dS). This kernel keeps
scores/probs/dS entirely in VMEM: forward reads q,k,v and writes o;
backward (custom VJP) re-computes the probabilities from q,k in VMEM and
writes only dq,dk,dv (+ the tiny (H,N,N) bias gradient). The recompute
FLOPs ride the otherwise idle MXU — the op is bandwidth-bound.

Reference parity: this implements exactly the math of
``nkbx/models/swin.py::WindowAttention`` (microsoft Swin semantics, the
architecture the torch reference reaches via timm — reference
model.py:82-83) and ``flax.linen.dot_product_attention`` for ViT; the
numeric differences are that scores stay in f32 between the two matmuls
(the XLA path rounds them to the compute dtype once — the kernel is
slightly MORE precise in bf16 mode) and that the softmax denominator is
inverted via Newton-refined approximate reciprocal (f32-accurate to ~1 ulp,
not bit-identical to the hardware divide; equality tests use tolerances).

Layout contract (chosen to avoid narrow-lane HBM padding):
  q, k, v, o : (G, N, H*D)    — heads packed in the minor dim, head-major
  qkv packed : (G, N, 3*H*D)  — fused_attention_qkv: the swin qkv-Dense
                                output consumed directly (no q/k/v slice
                                copies fwd; one dqkv grad tensor bwd, which
                                is exactly what the Dense backward wants)
  bias       : (H, N, N)      — learned additive bias, f32; or (1, N, N)
                                broadcast across heads (zeros for ViT)
  mask       : (M, N, N)      — constant additive mask, G % M == 0
                                (window w gets mask[w % M]); zeros (1,N,N)
                                when unused. No gradient.
The grid walks blocks of W windows; per block a static python loop over the
H heads slices (N, D) lanes out of the packed minor dim and runs the two
batched matmuls per head in VMEM. W is sized to the VMEM budget.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def recip_f32(q):
    """1/q via the VPU's approximate reciprocal + two Newton steps (4 madds)
    — f32-accurate, and measured cheaper than the hardware divide on the
    fused-MLP erf (experiments/r3_gelu_headroom.py: ~2.3 ms/step across
    convnext_tiny's MLPs). Shared by the kernels here and nkbx.ops.mlp."""
    r = pl.reciprocal(q, approx=True)
    r = r * (2.0 - q * r)
    return r * (2.0 - q * r)


def _softmax_rows(s):
    """Row softmax of f32 scores. One reciprocal per ROW via recip_f32 then
    an elementwise multiply, instead of jax.nn.softmax's elementwise divide
    of every probability by the row sum — the kernels are VPU-bound, and
    the hardware divide is many-cycle against the multiply's one."""
    e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    return e * recip_f32(jnp.sum(e, axis=-1, keepdims=True))


_FORCE_DISABLED = False


@contextlib.contextmanager
def disable_fused():
    """Force the plain-XLA attention path while tracing inside this context.

    Overrides even an explicit ``fused=True`` module flag: export tracing
    (``jax.export`` symbolic batch, jax2tf) cannot take the Pallas path —
    the block picker needs a concrete window count, and the emitted
    ``tpu_custom_call`` is not portable to SavedModel/TFLite. All export
    surfaces (nkbx/export/) wrap their traces in this."""
    global _FORCE_DISABLED
    prev = _FORCE_DISABLED
    _FORCE_DISABLED = True
    try:
        yield
    finally:
        _FORCE_DISABLED = prev


def fused_force_disabled() -> bool:
    return _FORCE_DISABLED


_AUTO_MIN_GROUPS = 1  # auto-mode G threshold. The round-3 per-stage G sweep
                      # (PERF.md) measured all-fused optimal or break-even at
                      # every Swin G (4096..8, bs=64 and bs=8), so the shipped
                      # gate is fully open; NKBX_FUSED_MIN_G remains as an ops
                      # escape hatch for untested window/batch geometries.


def resolve_fused(flag, auto: bool, groups=None) -> bool:
    """Resolve a model's fused-attention flag at trace time.

    Precedence: disable_fused() context (export tracing) > the
    ``NKBX_FUSED_ATTENTION=0|1`` env override (ops escape hatch / bisect
    tool) > the module flag (True/False) > the auto default (the model
    family's measured default: True-on-TPU for Swin, False for ViT — see
    PERF.md round 3). In auto mode, ``groups`` (the attention group count
    G = batch·windows, static at trace time) can gate the kernel per CALL
    SITE via ``NKBX_FUSED_MIN_G`` (route G < min_g stages to XLA). The
    round-3 sweep measured the all-fused program fastest at every Swin G,
    so the default threshold leaves the gate open — the knob exists because
    the kernel's win (keeping the (G,H,N,N) probs out of HBM) shrinks with
    G while its grid/dispatch overhead does not, and other window/batch
    geometries may cross over (ViT/32 at G=64,N=50 measures −2%)."""
    import os

    if _FORCE_DISABLED:
        return False
    env = os.environ.get("NKBX_FUSED_ATTENTION", "")
    if env:
        return env not in ("0", "false", "False")
    if flag is not None:
        return bool(flag)
    if not auto:
        return False
    min_g = int(os.environ.get("NKBX_FUSED_MIN_G", _AUTO_MIN_GROUPS))
    return groups is None or groups >= min_g

_ATTENTION_MESH = None  # (Mesh, axis_name) | None — see set_attention_mesh


def set_attention_mesh(mesh, axis: str = "data"):
    """Declare the mesh the fused kernels will run under (or None to clear).

    ``pallas_call`` has no GSPMD partitioning rule — jitted over a
    multi-device mesh it raises ("requires all mesh axes to be Manual",
    jax 0.9 pallas_call.py). The kernel is purely batched over its leading
    G dim, so when a mesh is declared the public entry points wrap the
    kernel in ``jax.shard_map`` over ``axis`` (batch-sharded q/k/v/o,
    replicated bias/mask); the bias gradient — the one cross-shard
    reduction — is returned per-shard and summed outside the shard_map.
    The engine sets this from its ``mesh=`` argument (nkbx/train/engine.py);
    meshes with a data axis of size 1 keep the plain single-device path.
    """
    global _ATTENTION_MESH
    _ATTENTION_MESH = None if mesh is None else (mesh, axis)


@contextlib.contextmanager
def attention_mesh(mesh, axis: str = "data"):
    global _ATTENTION_MESH
    prev = _ATTENTION_MESH
    set_attention_mesh(mesh, axis)
    try:
        yield
    finally:
        _ATTENTION_MESH = prev


def _active_mesh():
    """The declared (mesh, axis) when its data axis is actually >1."""
    if _ATTENTION_MESH is None:
        return None
    mesh, axis = _ATTENTION_MESH
    return (mesh, axis) if mesh.shape[axis] > 1 else None


def _check_shardable(g: int, m: int, mesh, axis: str):
    ndev = mesh.shape[axis]
    if g % ndev:
        raise ValueError(
            f"fused attention under a {ndev}-way '{axis}' mesh needs the "
            f"window-group count G={g} divisible by the axis size "
            f"(per-chip batch must divide the global batch)")
    if m > 1 and (g // ndev) % m:
        raise ValueError(
            f"fused attention shards G={g} into {ndev} chunks of {g // ndev}, "
            f"which misaligns the {m}-periodic shift mask — shard on whole-"
            f"image boundaries (G per shard must be a multiple of M={m})")


_VMEM_BUDGET = 10_000_000  # bytes of per-window tensors, under the ~16M VMEM
                           # with room for Pallas double-buffering. Measured
                           # (PERF.md r3): 10M beats the 6M first cut +4.2%
                           # (fewer grid steps); head-batched dot cores were
                           # break-even (the VMEM-forced W reduction cancels
                           # the larger-dot gain) and were dropped.


def _pick_block(g: int, m: int, n: int, hd: int, itemsize: int) -> int:
    """Largest W ≤ cap with W | G and (M | W or W | M) — see mask contract.

    The cap keeps the backward working set (≈ 8 (G,N,HD)-shaped blocks +
    4 f32 (N,N) score buffers per window, padded to 128 lanes) in VMEM.
    """
    pad = lambda x, t: -(-x // t) * t
    per_win = 8 * pad(n, 8) * pad(hd, 128) * itemsize + 4 * pad(n, 8) * pad(n, 128) * 4
    cap = max(1, min(64, _VMEM_BUDGET // per_win))
    for w in range(min(cap, g), 0, -1):
        if g % w == 0 and (w % m == 0 or m % w == 0):
            return w
    return 1


def _scores(q, k, bias_h, mask_ref, w, m, n, scale):
    """(W, N, N) f32 scores for one head: q kᵀ·scale + bias + mask."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_h[None].astype(jnp.float32)
    if m == 1:
        s = s + mask_ref[0][None].astype(jnp.float32)
    elif w % m == 0:
        s = s.reshape(w // m, m, n, n) + mask_ref[:].astype(jnp.float32)[None]
        s = s.reshape(w, n, n)
    else:  # W < M: the block spec delivered the aligned (W, N, N) mask slice
        s = s + mask_ref[:].astype(jnp.float32)
    return s


def _core_fwd(get_qkv, bias_ref, mask_ref, put_o, *, heads, hd, w, m, n,
              scale, out_dtype):
    bh = bias_ref.shape[0]  # 1 = head-broadcast bias (ViT zeros)
    d = hd // heads
    for h in range(heads):
        q, k, v = get_qkv(h * d, d)
        s = _scores(q, k, bias_ref[min(h, bh - 1)], mask_ref, w, m, n, scale)
        p = _softmax_rows(s).astype(out_dtype)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        put_o(h * d, d, o.astype(out_dtype))


def _core_bwd(get_qkv, bias_ref, mask_ref, g_ref, put_dq, put_dk, put_dv,
              dbias_ref, *, heads, hd, w, m, n, scale, out_dtype):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    bh = bias_ref.shape[0]
    d = hd // heads
    for h in range(heads):
        lo = h * d
        q, k, v = get_qkv(lo, d)
        g = g_ref[:, :, lo:lo + d]
        s = _scores(q, k, bias_ref[min(h, bh - 1)], mask_ref, w, m, n, scale)
        p = _softmax_rows(s)
        # dV = Pᵀ g
        dv = jax.lax.dot_general(p.astype(out_dtype), g,
                                 (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        put_dv(lo, d, dv.astype(out_dtype))
        # dP = g Vᵀ ; dS = P ∘ (dP − rowsum(dP ∘ P))
        dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_ref[min(h, bh - 1)] += jnp.sum(ds, axis=0)
        dsc = (ds * scale).astype(out_dtype)
        dq = jax.lax.dot_general(dsc, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        put_dq(lo, d, dq.astype(out_dtype))
        dk = jax.lax.dot_general(dsc, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        put_dk(lo, d, dk.astype(out_dtype))


# --- separate q/k/v entry (ViT: flax MultiHeadDotProductAttention hook) ----


def _fwd_kernel_sep(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, **kw):
    get = lambda lo, d: (q_ref[:, :, lo:lo + d], k_ref[:, :, lo:lo + d],
                         v_ref[:, :, lo:lo + d])

    def put_o(lo, d, val):
        o_ref[:, :, lo:lo + d] = val

    _core_fwd(get, bias_ref, mask_ref, put_o, **kw)


def _bwd_kernel_sep(q_ref, k_ref, v_ref, bias_ref, mask_ref, g_ref,
                    dq_ref, dk_ref, dv_ref, dbias_ref, **kw):
    get = lambda lo, d: (q_ref[:, :, lo:lo + d], k_ref[:, :, lo:lo + d],
                         v_ref[:, :, lo:lo + d])

    def putter(ref):
        def put(lo, d, val):
            ref[:, :, lo:lo + d] = val
        return put

    _core_bwd(get, bias_ref, mask_ref, g_ref, putter(dq_ref), putter(dk_ref),
              putter(dv_ref), dbias_ref, **kw)


# --- packed qkv entry (Swin: consumes the qkv Dense output directly) -------


def _fwd_kernel_packed(qkv_ref, bias_ref, mask_ref, o_ref, *, hd, **kw):
    get = lambda lo, d: (qkv_ref[:, :, lo:lo + d],
                         qkv_ref[:, :, hd + lo:hd + lo + d],
                         qkv_ref[:, :, 2 * hd + lo:2 * hd + lo + d])

    def put_o(lo, d, val):
        o_ref[:, :, lo:lo + d] = val

    _core_fwd(get, bias_ref, mask_ref, put_o, hd=hd, **kw)


def _bwd_kernel_packed(qkv_ref, bias_ref, mask_ref, g_ref,
                       dqkv_ref, dbias_ref, *, hd, **kw):
    get = lambda lo, d: (qkv_ref[:, :, lo:lo + d],
                         qkv_ref[:, :, hd + lo:hd + lo + d],
                         qkv_ref[:, :, 2 * hd + lo:2 * hd + lo + d])

    def put_at(off):
        def put(lo, d, val):
            dqkv_ref[:, :, off + lo:off + lo + d] = val
        return put

    _core_bwd(get, bias_ref, mask_ref, g_ref, put_at(0), put_at(hd),
              put_at(2 * hd), dbias_ref, hd=hd, **kw)


# --- pallas_call plumbing ---------------------------------------------------


def _specs(n, lanes, bias_heads, m, w):
    """(block spec for (G,N,lanes) tensors, bias spec, mask spec)."""
    qspec = pl.BlockSpec((w, n, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((bias_heads, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    if w % m == 0:
        mspec = pl.BlockSpec((m, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    else:  # W < M, M % W == 0: window (i·W + j) % M == (i % (M//W))·W + j
        mspec = pl.BlockSpec((w, n, n), lambda i: (i % (m // w), 0, 0),
                             memory_space=pltpu.VMEM)
    return qspec, bspec, mspec


def _interp(interpret):
    return jax.default_backend() != "tpu" if interpret is None else interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_sep(q, k, v, bias, mask, scale, heads, interpret=None):
    return _sep_fwd(q, k, v, bias, mask, scale, heads, interpret)


def _sep_fwd(q, k, v, bias, mask, scale, heads, interpret):
    g, n, hd = q.shape
    m = mask.shape[0]
    w = _pick_block(g, m, n, hd, q.dtype.itemsize)
    qspec, bspec, mspec = _specs(n, hd, bias.shape[0], m, w)
    kern = functools.partial(_fwd_kernel_sep, heads=heads, hd=hd, w=w, m=m,
                             n=n, scale=scale, out_dtype=q.dtype)
    return pl.pallas_call(
        kern,
        grid=(g // w,),
        in_specs=[qspec, qspec, qspec, bspec, mspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((g, n, hd), q.dtype),
        interpret=_interp(interpret),
    )(q, k, v, bias, mask)


def _sep_vjp_fwd(q, k, v, bias, mask, scale, heads, interpret):
    return _sep_fwd(q, k, v, bias, mask, scale, heads, interpret), (q, k, v, bias, mask)


def _sep_bwd_raw(q, k, v, bias, mask, go, scale, heads, interpret):
    """(dq, dk, dv, dbias_f32) for one (possibly per-shard) group block."""
    g_, n, hd = q.shape
    m = mask.shape[0]
    w = _pick_block(g_, m, n, hd, q.dtype.itemsize)
    qspec, bspec, mspec = _specs(n, hd, bias.shape[0], m, w)
    kern = functools.partial(_bwd_kernel_sep, heads=heads, hd=hd, w=w, m=m,
                             n=n, scale=scale, out_dtype=q.dtype)
    ts = jax.ShapeDtypeStruct((g_, n, hd), q.dtype)
    return pl.pallas_call(
        kern,
        grid=(g_ // w,),
        in_specs=[qspec, qspec, qspec, bspec, mspec, qspec],
        out_specs=(qspec, qspec, qspec, bspec),
        out_shape=(ts, ts, ts,
                   jax.ShapeDtypeStruct((bias.shape[0], n, n), jnp.float32)),
        interpret=_interp(interpret),
    )(q, k, v, bias, mask, go)


def _sep_vjp_bwd(scale, heads, interpret, res, go):
    q, k, v, bias, mask = res
    dq, dk, dv, dbias = _sep_bwd_raw(q, k, v, bias, mask, go, scale, heads,
                                     interpret)
    return dq, dk, dv, dbias.astype(bias.dtype), jnp.zeros_like(mask)


_fused_sep.defvjp(_sep_vjp_fwd, _sep_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_qkv(qkv, bias, mask, scale, heads, interpret=None):
    return _packed_fwd(qkv, bias, mask, scale, heads, interpret)


def _packed_fwd(qkv, bias, mask, scale, heads, interpret):
    g, n, hd3 = qkv.shape
    hd = hd3 // 3
    m = mask.shape[0]
    w = _pick_block(g, m, n, hd, qkv.dtype.itemsize)
    qspec, bspec, mspec = _specs(n, hd3, bias.shape[0], m, w)
    ospec, _, _ = _specs(n, hd, bias.shape[0], m, w)
    kern = functools.partial(_fwd_kernel_packed, heads=heads, hd=hd, w=w,
                             m=m, n=n, scale=scale, out_dtype=qkv.dtype)
    return pl.pallas_call(
        kern,
        grid=(g // w,),
        in_specs=[qspec, bspec, mspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((g, n, hd), qkv.dtype),
        interpret=_interp(interpret),
    )(qkv, bias, mask)


def _packed_vjp_fwd(qkv, bias, mask, scale, heads, interpret):
    return _packed_fwd(qkv, bias, mask, scale, heads, interpret), (qkv, bias, mask)


def _packed_bwd_raw(qkv, bias, mask, go, scale, heads, interpret):
    """(dqkv, dbias_f32) for one (possibly per-shard) group block."""
    g_, n, hd3 = qkv.shape
    hd = hd3 // 3
    m = mask.shape[0]
    w = _pick_block(g_, m, n, hd, qkv.dtype.itemsize)
    qspec, bspec, mspec = _specs(n, hd3, bias.shape[0], m, w)
    ospec, _, _ = _specs(n, hd, bias.shape[0], m, w)
    kern = functools.partial(_bwd_kernel_packed, heads=heads, hd=hd, w=w,
                             m=m, n=n, scale=scale, out_dtype=qkv.dtype)
    return pl.pallas_call(
        kern,
        grid=(g_ // w,),
        in_specs=[qspec, bspec, mspec, ospec],
        out_specs=(qspec, bspec),
        out_shape=(jax.ShapeDtypeStruct((g_, n, hd3), qkv.dtype),
                   jax.ShapeDtypeStruct((bias.shape[0], n, n), jnp.float32)),
        interpret=_interp(interpret),
    )(qkv, bias, mask, go)


def _packed_vjp_bwd(scale, heads, interpret, res, go):
    qkv, bias, mask = res
    dqkv, dbias = _packed_bwd_raw(qkv, bias, mask, go, scale, heads, interpret)
    return dqkv, dbias.astype(bias.dtype), jnp.zeros_like(mask)


_fused_qkv.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


# --- mesh-sharded twins (see set_attention_mesh) ----------------------------
#
# pallas_call cannot be partitioned by GSPMD, so under a multi-device mesh the
# kernel runs inside jax.shard_map over the data axis: q/k/v/qkv/go/o are
# batch-sharded on G (each shard is an independent, smaller instance of the
# same kernel — per-shard semantics are exact because the op is purely
# batched over G), bias/mask are replicated in, and the bias gradient — the
# only cross-shard reduction — is emitted per-shard on a sharded leading axis
# and summed OUTSIDE the shard_map (sidestepping replicated-cotangent
# transpose subtleties; check_vma=False because pallas declares no vma).


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused_sep_sharded(q, k, v, bias, mask, scale, heads, interpret, mesh, axis):
    return _sep_sharded_fwd(q, k, v, bias, mask, scale, heads, interpret,
                            mesh, axis)[0]


def _sep_sharded_fwd(q, k, v, bias, mask, scale, heads, interpret, mesh, axis):
    from jax.sharding import PartitionSpec as P

    _check_shardable(q.shape[0], mask.shape[0], mesh, axis)

    def fn(q_, k_, v_, b_, m_):
        return _sep_fwd(q_, k_, v_, b_, m_, scale, heads, interpret)

    shmap = jax.shard_map(fn, mesh=mesh,
                          in_specs=(P(axis), P(axis), P(axis), P(), P()),
                          out_specs=P(axis), check_vma=False)
    return shmap(q, k, v, bias, mask), (q, k, v, bias, mask)


def _sep_sharded_bwd(scale, heads, interpret, mesh, axis, res, go):
    from jax.sharding import PartitionSpec as P

    q, k, v, bias, mask = res

    def fn(q_, k_, v_, b_, m_, g_):
        dq, dk, dv, dbias = _sep_bwd_raw(q_, k_, v_, b_, m_, g_, scale,
                                         heads, interpret)
        return dq, dk, dv, dbias[None]  # (1, BH, N, N) per shard

    shmap = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)), check_vma=False)
    dq, dk, dv, dbias_parts = shmap(q, k, v, bias, mask, go)
    dbias = jnp.sum(dbias_parts, axis=0).astype(bias.dtype)
    return dq, dk, dv, dbias, jnp.zeros_like(mask)


_fused_sep_sharded.defvjp(_sep_sharded_fwd, _sep_sharded_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_qkv_sharded(qkv, bias, mask, scale, heads, interpret, mesh, axis):
    return _packed_sharded_fwd(qkv, bias, mask, scale, heads, interpret,
                               mesh, axis)[0]


def _packed_sharded_fwd(qkv, bias, mask, scale, heads, interpret, mesh, axis):
    from jax.sharding import PartitionSpec as P

    _check_shardable(qkv.shape[0], mask.shape[0], mesh, axis)

    def fn(qkv_, b_, m_):
        return _packed_fwd(qkv_, b_, m_, scale, heads, interpret)

    shmap = jax.shard_map(fn, mesh=mesh, in_specs=(P(axis), P(), P()),
                          out_specs=P(axis), check_vma=False)
    return shmap(qkv, bias, mask), (qkv, bias, mask)


def _packed_sharded_bwd(scale, heads, interpret, mesh, axis, res, go):
    from jax.sharding import PartitionSpec as P

    qkv, bias, mask = res

    def fn(qkv_, b_, m_, g_):
        dqkv, dbias = _packed_bwd_raw(qkv_, b_, m_, g_, scale, heads, interpret)
        return dqkv, dbias[None]

    shmap = jax.shard_map(
        fn, mesh=mesh, in_specs=(P(axis), P(), P(), P(axis)),
        out_specs=(P(axis), P(axis)), check_vma=False)
    dqkv, dbias_parts = shmap(qkv, bias, mask, go)
    return (dqkv, jnp.sum(dbias_parts, axis=0).astype(bias.dtype),
            jnp.zeros_like(mask))


_fused_qkv_sharded.defvjp(_packed_sharded_fwd, _packed_sharded_bwd)


# --- public entry points -----------------------------------------------------


def fused_attention(q, k, v, bias, mask, scale, heads, interpret=None):
    """softmax(q kᵀ·scale + bias + mask) v, fused in VMEM.

    q, k, v: (G, N, H·D); bias (H, N, N) learned additive bias, or (1, N, N)
    broadcast across heads (pass zeros for none); mask (M, N, N) additive
    constant (no grad) with G % M == 0. Under a declared multi-device mesh
    (set_attention_mesh) the kernel runs per-shard inside jax.shard_map.
    """
    ctx = _active_mesh()
    if ctx is not None:
        return _fused_sep_sharded(q, k, v, bias, mask, scale, heads,
                                  interpret, *ctx)
    return _fused_sep(q, k, v, bias, mask, scale, heads, interpret)


def fused_attention_qkv(qkv, bias, mask, scale, heads, interpret=None):
    """Packed-entry twin of fused_attention: qkv (G, N, 3·H·D) — the swin
    qkv-Dense output, factored (3, heads, hd) in the minor dim. Mesh-aware
    like fused_attention."""
    ctx = _active_mesh()
    if ctx is not None:
        return _fused_qkv_sharded(qkv, bias, mask, scale, heads, interpret,
                                  *ctx)
    return _fused_qkv(qkv, bias, mask, scale, heads, interpret)


def reference_attention(q, k, v, bias, mask, scale, heads):
    """Plain-XLA twin of fused_attention (same layout/dtype contract) —
    used by the equality tests."""
    g, n, hd = q.shape
    m = mask.shape[0]
    d = hd // heads
    qh = q.reshape(g, n, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(g, n, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(g, n, heads, d).transpose(0, 2, 1, 3)
    s = jnp.einsum("ghnd,ghmd->ghnm", qh.astype(jnp.float32),
                   kh.astype(jnp.float32)) * scale
    s = s + jnp.broadcast_to(bias, (heads, n, n))[None].astype(jnp.float32)
    s = s.reshape(g // m, m, heads, n, n) + mask[None, :, None].astype(jnp.float32)
    s = s.reshape(g, heads, n, n)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("ghnm,ghmd->ghnd", p.astype(jnp.float32),
                   vh.astype(jnp.float32))
    return o.astype(q.dtype).transpose(0, 2, 1, 3).reshape(g, n, hd)
