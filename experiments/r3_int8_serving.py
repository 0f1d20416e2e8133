"""Round-3 int8 serving probe — is quantized inference a TPU win here?

The reference's TRT runtime advertises int8 (trtmodule.py:16 maps the dtype)
but its export path only ever builds FP16 engines (export.py:271-282), so an
int8 TPU serving mode is beyond-parity capability. Before building one, this
measures whether int8 actually buys anything on this chip:

1. Dense microbench at ViT-B serving shapes (rows = 197*B tokens):
     a) bf16 x bf16 dot (the shipped serving compute)
     b) weight-only int8: w stored int8 (+ per-col fp scale), dequantized to
        bf16 inside the program each call (halves WEIGHT traffic iff XLA fuses
        convert+mul into the dot's operand read; otherwise it ADDS a
        materialize)
     c) full int8: dynamic per-tensor activation quant -> int8 x int8
        dot_general(preferred_element_type=int32) -> per-col rescale
        (2x MXU peak + halved traffic, changed numerics)
   Weights are passed as jit ARGUMENTS (resident in HBM) — baking them as
   constants would let XLA constant-fold variant (b)'s dequant at compile
   time, which models the artifact, not the runtime.
2. Whole-model weight-only probe on vit_base (weights-as-args apply) at
   serving batch sizes, plus top-1 agreement vs the fp32 program.

Timing is chained inside one jit (lax.fori_loop) per the round-2 rule
(per-dispatch tunnel microbenches are overhead-dominated), with an
optimization_barrier keyed on the loop carry so XLA cannot hoist the
loop-invariant dequant/quant work out of the loop (which is exactly the
work being measured).

Run with the chip idle, one process: python experiments/r3_int8_serving.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def chain_time(fn, args, iters=50, reps=3):
    """Median seconds per iteration of fn(args) (args: pytree of arrays),
    iterated inside ONE jit with a carry-keyed barrier (no hoisting)."""

    @jax.jit
    def body(args):
        def step(i, carry):
            c, a = lax.optimization_barrier((carry, args))
            out = fn(a)
            return c + jnp.sum(out[..., :1].astype(jnp.float32)) * 1e-30
        return lax.fori_loop(0, iters, step, jnp.float32(0.0))

    float(body(args))  # compile + the only reliable tunnel sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(body(args))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def quant_cols(w):
    """Per-output-channel symmetric int8: w ~= w_i8 * scale[None, :]."""
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    w_i8 = jnp.clip(jnp.round(w / s[None, :]), -127, 127).astype(jnp.int8)
    return w_i8, s.astype(jnp.float32)


def bench_dense(M, K, N):
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((K, N)) / np.sqrt(K), jnp.float32)
    w_bf16 = w.astype(jnp.bfloat16)
    w_i8, s = quant_cols(w)

    def f_bf16(a):
        x, w = a
        return jnp.dot(x, w)

    def f_wonly(a):
        x, w_i8, s = a
        wd = w_i8.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)[None, :]
        return jnp.dot(x, wd)

    def f_int8(a):
        x, w_i8, s = a
        ax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        sx = jnp.where(ax == 0, 1.0, ax / 127.0)
        x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        acc = lax.dot_general(x_i8, w_i8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (sx * s[None, :])).astype(jnp.bfloat16)

    t_b = chain_time(f_bf16, (x, w_bf16)) * 1e6
    t_w = chain_time(f_wonly, (x, w_i8, s)) * 1e6
    t_i = chain_time(f_int8, (x, w_i8, s)) * 1e6
    print(f"  M={M:6d} K={K:5d} N={N:5d}: bf16 {t_b:8.1f} us | "
          f"w-only int8 {t_w:8.1f} us ({t_b / t_w:4.2f}x) | "
          f"full int8 {t_i:8.1f} us ({t_b / t_i:4.2f}x)", flush=True)
    return t_b, t_w, t_i


def bench_vit_model(name="vit_base_patch16_224", iters=20, sizes=(1, 8, 32)):
    """Whole-model weight-only probe: ViT with weights as jit args."""
    from nkbx.models.classifier import get_model

    model = get_model({"task": "single", "model": name,
                       "pretrained": False}, classes=["a", "b"])
    module, variables = model.module, model.variables
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    leaves, treedef = jax.tree_util.tree_flatten(params)
    quantize = [l.ndim >= 2 and l.size >= (1 << 16) for l in leaves]  # static

    q_arrays, q_scales, b_arrays = [], [], []
    for l, q in zip(leaves, quantize):
        b_arrays.append(jnp.asarray(l, jnp.bfloat16))
        if q:
            w_i8, s = quant_cols(jnp.asarray(l).reshape(-1, l.shape[-1]))
            q_arrays.append(w_i8.reshape(l.shape))
            q_scales.append(s)
        else:
            q_arrays.append(jnp.asarray(l, jnp.bfloat16))
            q_scales.append(None)

    def apply_q(a):
        arrays, scales, other, x = a
        out = []
        for arr, s, q in zip(arrays, scales, quantize):
            out.append(arr.astype(jnp.bfloat16) * s.astype(jnp.bfloat16) if q else arr)
        p = jax.tree_util.tree_unflatten(treedef, out)
        return module.apply({**other, "params": p}, x, train=False)

    def apply_b(a):
        arrays, other, x = a
        p = jax.tree_util.tree_unflatten(treedef, arrays)
        return module.apply({**other, "params": p}, x, train=False)

    n_q = sum(quantize)
    qbytes = sum(a.size * (1 if q else 2) for a, q in zip(q_arrays, quantize))
    bbytes = sum(a.size * 2 for a in b_arrays)
    print(f"{name}: {n_q} quantized mats; resident weights "
          f"{qbytes / 1e6:.1f} MB int8 vs {bbytes / 1e6:.1f} MB bf16", flush=True)

    r = np.random.default_rng(1)
    for B in sizes:
        x = jnp.asarray(r.standard_normal((B, 224, 224, 3)), jnp.bfloat16)
        t_b = chain_time(apply_b, (b_arrays, other, x), iters=iters) * 1e3
        t_q = chain_time(apply_q, (q_arrays, q_scales, other, x), iters=iters) * 1e3
        print(f"  bs={B:3d}: bf16 {t_b:7.2f} ms | w-only int8 {t_q:7.2f} ms "
              f"({t_b / t_q:4.2f}x)", flush=True)

    # numerics: top-1 agreement + logit error vs the fp32 program
    x = jnp.asarray(r.standard_normal((64, 224, 224, 3)), jnp.float32)
    ref = np.asarray(jax.jit(lambda v, x: module.apply(v, x, train=False))(variables, x),
                     np.float32)
    qlog = np.asarray(jax.jit(apply_q)((q_arrays, q_scales, other,
                                        x.astype(jnp.bfloat16))), np.float32)
    blog = np.asarray(jax.jit(apply_b)((b_arrays, other,
                                        x.astype(jnp.bfloat16))), np.float32)
    agree_q = float((ref.argmax(-1) == qlog.argmax(-1)).mean())
    agree_b = float((ref.argmax(-1) == blog.argmax(-1)).mean())
    print(f"  top-1 agreement vs fp32: bf16 {agree_b:.3f}, w-only int8 {agree_q:.3f}; "
          f"max|dlogit| bf16 {np.abs(ref - blog).max():.4f}, "
          f"int8 {np.abs(ref - qlog).max():.4f}", flush=True)


if __name__ == "__main__":
    import sys
    if "--smoke" in sys.argv:  # CPU syntax/shape check, not a measurement
        bench_dense(197, 256, 512)
        bench_vit_model("vit_tiny_patch16_224", iters=2, sizes=(1,))
        raise SystemExit
    print("== dense microbench (ViT-B serving shapes, rows=197*B) ==", flush=True)
    for B in (1, 8, 32):
        M = 197 * B
        for K, N in ((768, 2304), (768, 768), (768, 3072), (3072, 768)):
            bench_dense(M, K, N)
    print("== whole-model weight-only probe ==", flush=True)
    bench_vit_model()
