"""Round-3: fused Pallas MLP (nkbx/ops/mlp.py) on the transformer families.

The kernel that delivered +26% on convnext_tiny applies to every
transformer MLP in the zoo with the same (rows, 4C) GELU-intermediate
traffic: Swin fc1/fc2 (stages 1-3 pass the VMEM gate, C ≤ 384) and ViT
Dense_0/Dense_1 (only geometries whose token rows tile — the /16 models'
B·197 rows have no ≥128 divisor, so they stay XLA automatically).

Variants measured fused off/on per family; the ON numbers decide the
shipped auto defaults. Timing discipline = experiments/r3_zoo_refresh.py
(bs=64 @224 bf16 full train step, scan K=4, subprocess per variant, chip
idle, host quiet).

Usage:
  PYTHONPATH=/root/.axon_site python experiments/r3_transformer_fused_mlp.py all
  PYTHONPATH=/root/.axon_site python experiments/r3_transformer_fused_mlp.py <family> <0|1>
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

BS = 64
K = 4

FAMILIES = ["swin_tiny_patch4_window7_224", "vit_small_patch32_224",
            "vit_base_patch16_224"]


def run(family, fused):
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.registry import _REGISTRY
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = _REGISTRY[family](dtype=jnp.bfloat16, fused_mlp=fused)
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
    sync(metrics)
    state, metrics = step(state, *args)
    sync(metrics)
    chunks = 4
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, metrics = step(state, *args)
    loss = sync(metrics)
    dt = (time.perf_counter() - t0) / (chunks * K)
    print(json.dumps({"family": family, "fused_mlp": fused, "bs": BS,
                      "ms_per_step": round(dt * 1e3, 2),
                      "img_per_s": round(BS / dt, 1), "loss": round(loss, 4)}))


def run_all():
    for family in FAMILIES:
        for flag in ("0", "1"):
            p = subprocess.run([sys.executable, __file__, family, flag],
                               capture_output=True, text=True, timeout=1800)
            line = next((ln for ln in p.stdout.splitlines()
                         if ln.startswith("{")), None)
            print(line if line else json.dumps(
                {"family": family, "fused_mlp": flag,
                 "error": p.stderr.splitlines()[-1:]}))


if __name__ == "__main__":
    if len(sys.argv) > 2:
        run(sys.argv[1], sys.argv[2] == "1")
    else:
        run_all()
