"""Round-4 max-throughput tier measurement (PERF.md "beyond-parity" table).

Variants of the bench.py ResNet-50 @224 bs=128 step, all SEMANTICS-CHANGING
opt-ins (labeled; not eligible for the parity headline):

  base          exact-BN fp32-master baseline (bench.py program, K=10)
  ghost2        ghost_bn=2 (per-2-sample BN stats), XLA path
  ghost2_fused  ghost_bn=2 + fused_bottleneck=True (Pallas chain kernel)
  bf16m         bf16 master weights + optimizer state
  ghost2_bf16m  ghost2 + bf16m (the candidate max-throughput recipe)

Usage: python experiments/r4_max_throughput.py <variant>
(one process per variant; keep the host quiet — CLAUDE.md timing rules)
"""

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main(variant):
    import jax

    from nkbx.core import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models import get_model
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    batch_size, K = 128, 10
    opts = {}
    if variant.startswith("ghost2"):
        opts["ghost_bn"] = 2
    if variant == "ghost2_fused":
        opts["fused_bottleneck"] = True
    master_dtype = jnp.bfloat16 if variant.endswith("bf16m") else None

    model = get_model(
        {"task": "single", "model": "resnet50", "pretrained": False,
         "backbone_opts": opts},
        classes=[f"c{i}" for i in range(1000)],
        input_size=(224, 224), dtype=jnp.bfloat16)
    pipeline = T.Compose([
        T.HorizontalFlip(p=0.5),
        T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
    ])
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.1})
    step = build_train_step(model, criterion, bundle,
                            augment_fn=pipeline.device_apply, scan_steps=K)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx,
                              master_dtype=master_dtype)

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
    print(json.dumps({"variant": variant, "img_per_s": round(batch_size / dt, 1),
                      "ms_per_step": round(dt * 1e3, 3)}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "base")
