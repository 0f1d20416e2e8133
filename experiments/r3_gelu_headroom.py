"""Round-3: how much of the fused-MLP kernel time is the exact-GELU erf?

The post-fusion profile says the Pallas fwd/bwd kernels are
VPU-transcendental-bound (stage-1 fwd 0.62 ms vs ~0.35 ms roofline). This
probe monkeypatches nkbx.ops.mlp._erf_f32 with a 2-op polynomial STAND-IN
(wrong values, right op count ~= none) and re-times the convnext_tiny
step. The delta is the total upside of ANY cheaper-erf scheme — if it's
small, don't build one.

NOT a semantics-preserving variant — numbers only, never shipped.

Usage:
  PYTHONPATH=/root/.axon_site python experiments/r3_gelu_headroom.py all
  PYTHONPATH=/root/.axon_site python experiments/r3_gelu_headroom.py <exact|stub>
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

    import nkbx.ops.mlp as mlp_mod

    if variant == "stub":
        def _stub_erf(x):  # 2 VPU ops, clamped-linear junk
            return jnp.clip(x * 0.8, -1.0, 1.0)

        mlp_mod._erf_f32 = _stub_erf
    elif variant == "nodiv":
        # same madd count as the exact rational, division dropped (junk
        # values) — isolates the VPU cost of the divide
        alpha, beta = mlp_mod._ERF_ALPHA, mlp_mod._ERF_BETA

        def _nodiv_erf(x):
            x = jnp.clip(x, -4.0, 4.0)
            x2 = x * x
            p = jnp.float32(alpha[0])
            for c in alpha[1:]:
                p = p * x2 + c
            q = jnp.float32(beta[0])
            for c in beta[1:]:
                q = q * x2 + c
            return x * (p - q)

        mlp_mod._erf_f32 = _nodiv_erf
    elif variant == "noexp":
        # exact erf kept; backward pdf term's exp replaced by a mul (junk
        # values) — isolates the VPU cost of the exp in gelu'
        inv = mlp_mod._INV_SQRT_2PI

        def _noexp_gelu_and_grad(u):
            cdf = 0.5 * (1.0 + mlp_mod._erf_f32(u * mlp_mod._SQRT_HALF))
            pdf = (0.5 * u * u) * inv
            return u * cdf, cdf + u * pdf

        mlp_mod._gelu_and_grad_f32 = _noexp_gelu_and_grad

    import nkbx.transforms as T
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.convnext import convnext_tiny
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = convnext_tiny(dtype=jnp.bfloat16, fused_mlp=True)
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
    args = (image, label, mask, jax.random.PRNGKey(0),
            jnp.asarray(1.0), jnp.asarray(1.0))

    def sync(metrics):
        return float(metrics["loss"][-1])

    state, metrics = step(state, *args)
    sync(metrics)
    state, metrics = step(state, *args)
    sync(metrics)
    t0 = time.perf_counter()
    for _ in range(4):
        state, metrics = step(state, *args)
    sync(metrics)
    dt = (time.perf_counter() - t0) / (4 * K)
    print(json.dumps({"variant": variant, "bs": BS,
                      "ms_per_step": round(dt * 1e3, 2),
                      "img_per_s": round(BS / dt, 1)}))


def run_all():
    for variant in ("exact", "stub", "nodiv", "noexp"):
        p = subprocess.run([sys.executable, __file__, variant],
                           capture_output=True, text=True, timeout=1800)
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")), None)
        print(line if line else
              f'{{"variant": "{variant}", "error": {p.stderr.splitlines()[-1:]!r}}}')


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    run_all() if arg == "all" else run(arg)
