"""Round-3 zoo refresh: full train step across registry families, current code.

The round-2 zoo datapoints in PERF.md predate the round-3 changes (fused
Pallas window attention default, engine scan tweaks, augment rework). This
harness re-measures a representative backbone per family under the CURRENT
defaults so PERF.md's breadth table is evidence about the shipped code, and
regressions on non-headline families are caught.

Discipline matches experiments/r3_swin_attention.py: full bf16 train step
(flip+normalize on-device augment, CE loss, SGD), bs=64 @224, scan K=4,
4 timed chunks after 2 warm-up dispatches, chip idle (CLAUDE.md), one model
per process (subprocesses for `all` keep compile caches/memory isolated).

Usage:
  PYTHONPATH=/root/.axon_site python experiments/r3_zoo_refresh.py <name>
  PYTHONPATH=/root/.axon_site python experiments/r3_zoo_refresh.py all
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# `python experiments/r3_zoo_refresh.py` puts experiments/ (not the repo
# root) at sys.path[0]; subprocess children need the root for `import nkbx`.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

BS = 64
K = 4

ZOO = [
    "resnet50",
    "mobilenetv3_large_100",
    "efficientnet_b0",
    "efficientnetv2_s",
    "densenet121",
    "seresnext50_32x4d",
    "convnext_tiny",
    "vit_base_patch16_224",
    "swin_tiny_patch4_window7_224",
    "unicom ViT-B/16",
]


def run(name):
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.registry import create_backbone
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = create_backbone(name, dtype=jnp.bfloat16)
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
    print(json.dumps({"model": name, "bs": BS,
                      "ms_per_step": round(dt * 1e3, 2),
                      "img_per_s": round(BS / dt, 1), "loss": round(loss, 4)}))


def run_all():
    for name in ZOO:
        p = subprocess.run([sys.executable, __file__, name],
                           capture_output=True, text=True, timeout=1200)
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")), None)
        print(line if line else json.dumps(
            {"model": name, "error": p.stderr.splitlines()[-1:]}))


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    run_all() if arg == "all" else run(arg)
