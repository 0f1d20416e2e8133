"""Round-3: fused Pallas window/full attention vs the XLA path, on-chip.

Measures the full train step (bf16, incl. flip+normalize augment, same shape
as the round-2 zoo datapoints in PERF.md) for swin_tiny and vit_base_p16 with
the fused kernel (nkbx/ops/attention.py) on and off.

Usage: python experiments/r3_swin_attention.py {smoke|swin_fused|swin_xla|
vit_fused|vit_xla} [bs] [min_g]  — one variant per invocation, chip idle
(CLAUDE.md). ``bs`` defaults to 64; ``min_g`` (swin auto-mode only) sets
NKBX_FUSED_MIN_G to route small-G stages to XLA (swin_auto variant).

Measured (2026-08-17, PERF.md "Round-3 fused window attention"):
  swin_xla 84.96 ms → 753 img/s | swin_fused 58.93 ms → 1,086 (+44.2%)
  vit_xla  60.78 ms → 1,053     | vit_fused  65.29 ms → 980 (−7%, negative)
G sweep (PERF.md "per-stage G sweep") — all-fused optimal at every Swin G:
  bs=64: auto min_g=128 58.86 ms (break-even) | min_g=512 66.67 (−12%)
  bs=8:  fused 10.31 ms | auto min_g=128 11.48 (−10%) | xla 12.68 (−19%)
"""

import json
import sys
import time

import numpy as np

BS = 64
K = 4


def smoke():
    """Compile-check the kernel on the real backend with swin stage shapes."""
    import jax
    import jax.numpy as jnp

    from nkbx.ops.attention import fused_attention_qkv, reference_attention

    rng = np.random.RandomState(0)
    for g, n, heads, d, m in [(8 * 16, 49, 6, 32, 16), (8, 49, 24, 32, 1)]:
        hd = heads * d
        qkv = jnp.asarray(rng.randn(g, n, 3 * hd), jnp.bfloat16)
        bias = jnp.asarray(rng.randn(heads, n, n) * 0.1, jnp.float32)
        mask = jnp.asarray(
            np.where(rng.rand(m, n, n) < 0.2, -100.0, 0.0), jnp.float32)

        def loss(qkv, bias):
            o = fused_attention_qkv(qkv, bias, mask, d ** -0.5, heads)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        val, (dqkv, dbias) = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(qkv, bias)
        q, k, v = qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:]
        want = reference_attention(q, k, v, bias, mask, d ** -0.5, heads)
        got = fused_attention_qkv(qkv, bias, mask, d ** -0.5, heads)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                    want.astype(jnp.float32))))
        print(json.dumps({"g": g, "heads": heads, "m": m, "loss": float(val),
                          "max_abs_err_vs_xla": err,
                          "dbias_norm": float(jnp.sum(dbias ** 2))}))


def run(variant):
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models import swin as swin_mod
    from nkbx.models import vit as vit_mod
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    def make_model(backbone):
        module = SingletaskClassifier(backbone=backbone, n_classes=1000)
        init = jax.jit(lambda rng: module.init(
            {"params": rng}, jnp.zeros((1, 224, 224, 3), jnp.float32), train=False))
        variables = dict(init(jax.random.PRNGKey(0)))
        return ClassificationModel(module, variables,
                                   [f"c{i}" for i in range(1000)], "single",
                                   backbone.num_features)

    # "auto" leaves the flag None so the NKBX_FUSED_MIN_G per-stage gate runs
    fused = None if variant.endswith("auto") else variant.endswith("fused")
    if variant.startswith("swin"):
        backbone = swin_mod.swin_tiny_patch4_window7_224(
            dtype=jnp.bfloat16, fused_attention=fused)
    else:
        backbone = vit_mod.vit_base_patch16_224(
            dtype=jnp.bfloat16, fused_attention=fused)
    model = make_model(backbone)
    pipeline = T.Compose([T.HorizontalFlip(p=0.5), T.Normalize()])
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.1})
    step = build_train_step(model, criterion, bundle,
                            augment_fn=pipeline.device_apply, scan_steps=K)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx)

    r = np.random.default_rng(0)
    image = jnp.asarray(np.broadcast_to(
        r.integers(0, 255, (BS, 224, 224, 3)).astype(np.uint8),
        (K, BS, 224, 224, 3)).copy())
    label = jnp.asarray(np.broadcast_to(
        r.integers(0, 1000, (BS,)).astype(np.int64), (K, BS)).copy())
    mask = jnp.ones((K, BS), bool)
    key = jax.random.PRNGKey(0)
    one = jnp.asarray(1.0)
    args = (image, label, mask, key, one, one)

    def sync(metrics):
        return float(metrics["loss"][-1])

    state, metrics = step(state, *args)
    sync(metrics)
    state, metrics = step(state, *args)
    sync(metrics)
    chunks = 4
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, metrics = step(state, *args)
    loss = sync(metrics)
    dt = (time.perf_counter() - t0) / (chunks * K)
    import os

    print(json.dumps({"variant": variant, "bs": BS,
                      "min_g": os.environ.get("NKBX_FUSED_MIN_G"),
                      "ms_per_step": round(dt * 1e3, 2),
                      "img_per_s": round(BS / dt, 1), "loss": round(loss, 4)}))


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    if len(sys.argv) > 2:
        BS = int(sys.argv[2])
    if len(sys.argv) > 3:
        import os

        os.environ["NKBX_FUSED_MIN_G"] = sys.argv[3]
    smoke() if arg == "smoke" else run(arg)
