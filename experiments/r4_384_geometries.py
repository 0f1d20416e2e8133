"""Round-4: 384-px geometries measured on chip (VERDICT r3 #4).

The _384 registry names were correctness-tested in round 3 (fused window-12
attention equality, pos_embed resampling) but never timed on hardware. This
harness measures full bf16 train steps at 384 input:

  swin384        swin_base_patch4_window12_384, fused attention ON (default)
  swin384_xla    same, fused_attention=False (the gate A/B at window 12:
                 grids 96/48/24/12, G per stage down to bs — NKBX_FUSED_MIN_G
                 default-open verdict comes from this pair)
  vit384         vit_small_patch16_384 (577 tokens; ViT default = XLA
                 attention per the round-3 sweep)

Same discipline as r3_zoo_refresh (scan K, 2 warm-ups, 4 timed chunks, one
process per variant, quiet host). bs=16 for swin-base (the @384 big-model
regime), bs=32 for vit-small.

Usage: python experiments/r4_384_geometries.py <variant>|all
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

K = 4

VARIANTS = {
    "swin384": ("swin_base_patch4_window12_384", 16, {}),
    "swin384_xla": ("swin_base_patch4_window12_384", 16,
                    {"fused_attention": False, "fused_mlp": False}),
    "vit384": ("vit_small_patch16_384", 32, {}),
}


def run(variant):
    name, bs, opts = VARIANTS[variant]
    import jax

    from nkbx.core import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.registry import create_backbone
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = create_backbone(name, dtype=jnp.bfloat16, **opts)
    module = SingletaskClassifier(backbone=backbone, n_classes=1000)
    init = jax.jit(lambda rng: module.init(
        {"params": rng}, jnp.zeros((1, 384, 384, 3), jnp.float32), train=False))
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
        r.integers(0, 255, (bs, 384, 384, 3)).astype(np.uint8),
        (K, bs, 384, 384, 3)).copy())
    label = jnp.asarray(np.broadcast_to(
        r.integers(0, 1000, (bs,)).astype(np.int64), (K, bs)).copy())
    mask = jnp.ones((K, bs), bool)
    key, one = jax.random.PRNGKey(0), jnp.asarray(1.0)
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
    print(json.dumps({"variant": variant, "model": name, "bs": bs,
                      "ms_per_step": round(dt * 1e3, 2),
                      "img_per_s": round(bs / dt, 1),
                      "loss": round(loss, 4)}))


def run_all():
    for variant in VARIANTS:
        p = subprocess.run([sys.executable, __file__, variant],
                           capture_output=True, text=True, timeout=3000)
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")), None)
        print(line if line else json.dumps(
            {"variant": variant, "error": p.stderr.splitlines()[-1:]}))


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    run_all() if arg == "all" else run(arg)
