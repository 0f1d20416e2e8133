"""Round-3: remat sweep on convnext_tiny (the HBM-traffic attack).

The attribution profile (experiments/r3_convnext_profile.py + PERF.md)
shows the 50 ms convnext_tiny step is 61% backward, with Dense_1 (the
4*dim -> dim projection) alone at 21.8 ms — the backward re-reads two
(4*dim)-wide GELU intermediates per block (147 MB each at stage 1,
bs=64). ResNet's remat sweep was a measured negative (its saved
activations are narrow); ConvNeXt's are 4x wider, so re-test here.

Variants: remat over stage subsets (high-res stages store the widest
intermediates). Timing discipline = experiments/r3_zoo_refresh.py
(bs=64 @224 bf16 full train step, scan K=4, subprocess per variant).

Usage:
  PYTHONPATH=/root/.axon_site python experiments/r3_convnext_remat.py <variant>
  PYTHONPATH=/root/.axon_site python experiments/r3_convnext_remat.py all
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

VARIANTS = {
    "base": (),
    "s01": (0, 1),
    "s012": (0, 1, 2),
    "all": (0, 1, 2, 3),
}


def run(variant):
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.convnext import convnext_tiny
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = convnext_tiny(dtype=jnp.bfloat16,
                             remat_stages=VARIANTS[variant])
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
    print(json.dumps({"variant": variant, "remat_stages": VARIANTS[variant],
                      "bs": BS, "ms_per_step": round(dt * 1e3, 2),
                      "img_per_s": round(BS / dt, 1), "loss": round(loss, 4)}))


def run_all():
    for name in VARIANTS:
        p = subprocess.run([sys.executable, __file__, name],
                           capture_output=True, text=True, timeout=1200)
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")), None)
        print(line if line else
              f'{{"variant": {name!r}, "error": {p.stderr.splitlines()[-1:]!r}}}')


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    run_all() if arg == "all" else run(arg)
