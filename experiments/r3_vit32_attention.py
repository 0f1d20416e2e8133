"""Round-3 follow-up: fused Pallas attention for the SMALL-N ViT variants.

r3_swin_attention.py established the regime split: the fused kernel wins
+44% at Swin's N=49-token windows but loses −7% at ViT-B/16's N=197 (XLA's
batched attention already fills the MXU there). The /32 patch variants sit
in the SWIN regime — vit_*_patch32_224 runs N=50 (49 patches + cls) and
unicom ViT-B/32 N=49 — yet ViT's auto-default is plain XLA, measured only
at N=197. This measures the full bf16 train step (same harness as
r3_swin_attention.py) fused vs XLA for those models to set the ViT
auto-default by token count.

Usage: python experiments/r3_vit32_attention.py
           {vitb32|vits32|unicom_b32}_{fused|xla}
one variant per invocation, chip idle (CLAUDE.md: concurrent host load
corrupts timings ~5x).

Measured (2026-08-17, chip idle; PERF.md "Round-3 fused attention — ViT /32"):
  vitb32_xla       10.78 ms → 5,936 img/s | vitb32_fused  10.99 ms → 5,822 (−2%)
  vits32_xla        5.27 ms → 12,153      | vits32_fused   5.48 ms → 11,673 (−4%)
  unicom_b32_xla   12.13 ms → 5,278      | unicom_b32_fused 12.34 ms → 5,186 (−2%)
Negative across the board: at B=64 groups of N=50 XLA batches the per-head
dots densely enough, and the (B, N, N) probs tensor is small (640 KB bf16)
— the HBM round trip the kernel saves is a far smaller fraction of step
time than in Swin (whose G=B·windows=1,024+ makes probs 16x larger while
each dot is the same shape). ViT auto-default stays XLA at every N.
"""

import json
import sys
import time

import numpy as np

BS = 64
K = 4


def run(variant):
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models import vit as vit_mod
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    fused = variant.endswith("fused")
    arch = variant.rsplit("_", 1)[0]
    backbone = {
        "vitb32": vit_mod.vit_base_patch32_224,
        "vits32": vit_mod.vit_small_patch32_224,
        "unicom_b32": vit_mod.unicom_vit_b32,
    }[arch](dtype=jnp.bfloat16, fused_attention=fused)

    module = SingletaskClassifier(backbone=backbone, n_classes=1000)
    init = jax.jit(lambda rng: module.init(
        {"params": rng}, jnp.zeros((1, 224, 224, 3), jnp.float32), train=False))
    variables = dict(init(jax.random.PRNGKey(0)))
    model = ClassificationModel(module, variables,
                                [f"c{i}" for i in range(1000)], "single",
                                backbone.num_features)

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
    sync(metrics)  # sync right after the compiling step (CLAUDE.md)
    state, metrics = step(state, *args)
    sync(metrics)
    chunks = 8
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, metrics = step(state, *args)
    loss = sync(metrics)
    dt = (time.perf_counter() - t0) / (chunks * K)
    print(json.dumps({"variant": variant, "ms_per_step": round(dt * 1e3, 2),
                      "img_per_s": round(BS / dt, 1), "loss": round(loss, 4)}))


if __name__ == "__main__":
    run(sys.argv[1])
