"""Round-5 densenet121 concat attack: preallocated block buffer vs per-layer
concatenate (VERDICT r4 task #1, densenet leg).

The r5 device trace (experiments/r3_postfusion_profile.py densenet121) puts
19.1% of the 33.0 ms device step in slice/concat/pad kernels — each layer's
jnp.concatenate re-stores the whole accumulated prefix to append 32 growth
channels. `DenseNet(buffer_concat=True)` instead grows each block inside one
preallocated (B, H, W, C_end) buffer with static .at[].set updates (exact
same math + param tree, tests/test_models.py): if XLA aliases the updates
in place, per-layer stores drop from a(c+32) to a(32). The analytic budget
(experiments/r5_family_rooflines.py) prices the win at up to ~2.3 GB/step
(~6 ms at delivered bandwidth).

This was NOT the r3 split-concat attack (that fragmented the 1x1 matmul into
per-group K<=128 contractions, a measured -38%); here the matmuls keep full K.

Discipline: full bf16 train step (flip+normalize augment, CE, SGD), bs=64
@224, scan K=4, 2 warm dispatches + 4 timed chunks, chip idle, one variant
per process.

Usage:
  python experiments/r5_densenet_buffer.py            # both, subprocesses
  python experiments/r5_densenet_buffer.py concat     # one variant
  python experiments/r5_densenet_buffer.py buffer
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


def run(variant):
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.densenet import DenseNet
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = DenseNet(block_config=(6, 12, 24, 16), dtype=jnp.bfloat16,
                        buffer_concat=(variant == "buffer"))
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
    args = (image, label, mask, jax.random.PRNGKey(0), jnp.asarray(1.0),
            jnp.asarray(1.0))

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
    print(json.dumps({"variant": variant, "bs": BS,
                      "ms_per_step": round(dt * 1e3, 2),
                      "img_per_s": round(BS / dt, 1), "loss": round(loss, 4)}))


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    if arg == "all":
        for variant in ("concat", "buffer"):
            p = subprocess.run([sys.executable, __file__, variant],
                               capture_output=True, text=True, timeout=1200)
            line = next((ln for ln in p.stdout.splitlines()
                         if ln.startswith("{")), None)
            print(line if line else json.dumps(
                {"variant": variant, "error": p.stderr.splitlines()[-3:]}))
    else:
        run(arg)
