"""Modern-recipe training throughput (VERDICT r3 #8 — per-round regression pin).

ResNet-50 @224 bs=128 with the full modern recipe on device: RandAugment(2, 9)
+ HorizontalFlip + Normalize in the fused augment kernel, Mixup(0.2), and
EMA(0.9998) in the donated train step. Re-run each round next to bench.py;
PERF.md keeps the per-round table.

Usage: python experiments/r4_modern_recipe.py   (quiet host, idle chip)
"""

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    import jax

    from nkbx.core import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models import get_model
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    batch_size, K = 128, 10
    model = get_model(
        {"task": "single", "model": "resnet50", "pretrained": False},
        classes=[f"c{i}" for i in range(1000)],
        input_size=(224, 224), dtype=jnp.bfloat16)
    pipeline = T.Compose([
        T.RandAugment(num_ops=2, magnitude=9),
        T.HorizontalFlip(p=0.5),
        T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
    ])
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.1})
    step = build_train_step(model, criterion, bundle,
                            augment_fn=pipeline.device_apply, scan_steps=K,
                            ema_decay=0.9998, mixup={"alpha": 0.2})
    state = TrainState.create(model.params, model.batch_stats, bundle.tx,
                              ema=True)

    r = np.random.default_rng(0)
    image = jnp.asarray(np.broadcast_to(
        r.integers(0, 255, (batch_size, 224, 224, 3)).astype(np.uint8),
        (K, batch_size, 224, 224, 3)).copy())
    label = jnp.asarray(np.broadcast_to(
        r.integers(0, 1000, (batch_size,)).astype(np.int64),
        (K, batch_size)).copy())
    mask = jnp.ones((K, batch_size), bool)
    key, one = jax.random.PRNGKey(0), jnp.asarray(1.0)

    def sync(m):
        return float(m["loss"][-1])

    state, metrics = step(state, image, label, mask, key, one, one)
    sync(metrics)
    state, metrics = step(state, image, label, mask, key, one, one)
    sync(metrics)
    chunks = 4
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, metrics = step(state, image, label, mask, key, one, one)
    sync(metrics)
    dt = (time.perf_counter() - t0) / (chunks * K)
    print(json.dumps({
        "recipe": "resnet50 @224 bs=128 + RandAugment(2,9) + Mixup(0.2) + EMA(0.9998)",
        "img_per_s": round(batch_size / dt, 1),
        "ms_per_step": round(dt * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
