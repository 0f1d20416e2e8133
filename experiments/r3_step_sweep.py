"""Round-3 bytes-per-image sweep for the ResNet-50 train step (VERDICT r2 #1).

The round-2 roofline put the step at ~99% of tunnel-delivered HBM bandwidth,
so more img/s requires moving fewer bytes. This sweep measures, one variant
per invocation (one process per chip — see CLAUDE.md):

  base      - round-2 program (s2d stem, bs=128, scan_steps=10)
  fold      - Normalize folded into the s2d stem conv (uint8 augment output)
  remat01   - jax.checkpoint over stage-0/1 blocks (recompute vs saved-act traffic)
  remat_all - jax.checkpoint over all stages
  k20       - scan_steps=20 (dispatch-amortization check)
  cost      - compiled cost_analysis + analytic bytes/image budget (no timing)

Usage: python experiments/r3_step_sweep.py <variant>
Results recorded in PERF.md.
"""

import json
import sys
import time

import numpy as np

BS = 128
K = 10
MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
STD = np.array([0.229, 0.224, 0.225], np.float32) * 255.0


def make_model(backbone):
    import jax
    import jax.numpy as jnp

    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier

    module = SingletaskClassifier(backbone=backbone, n_classes=1000)
    init = jax.jit(lambda rng: module.init(
        {"params": rng}, jnp.zeros((1, 224, 224, 3), jnp.float32), train=False))
    variables = dict(init(jax.random.PRNGKey(0)))
    return ClassificationModel(module, variables,
                               [f"c{i}" for i in range(1000)], "single",
                               backbone.num_features)


def build(variant, k=K):
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models.resnet import resnet50
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    kwargs = dict(dtype=jnp.bfloat16)
    pipe_ts = [T.HorizontalFlip(p=0.5), T.Normalize()]
    if variant == "fold":
        kwargs["input_norm"] = (MEAN, STD)
        pipe_ts = [T.HorizontalFlip(p=0.5)]  # model consumes raw [0,255]
    elif variant == "remat01":
        kwargs["remat_stages"] = (0, 1)
    elif variant == "remat_all":
        kwargs["remat_stages"] = (0, 1, 2, 3)
    model = make_model(resnet50(**kwargs))
    pipeline = T.Compose(pipe_ts)
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.1})
    step = build_train_step(model, criterion, bundle,
                            augment_fn=pipeline.device_apply, scan_steps=k)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx)
    return step, state


def run(variant):
    import jax
    import jax.numpy as jnp

    k = 20 if variant == "k20" else K
    base_variant = "base" if variant in ("k20", "cost") else variant
    step, state = build(base_variant, k=k)

    r = np.random.default_rng(0)
    image = jnp.asarray(np.broadcast_to(
        r.integers(0, 255, (BS, 224, 224, 3)).astype(np.uint8),
        (k, BS, 224, 224, 3)).copy())
    label = jnp.asarray(np.broadcast_to(
        r.integers(0, 1000, (BS,)).astype(np.int64), (k, BS)).copy())
    mask = jnp.ones((k, BS), bool)
    key = jax.random.PRNGKey(0)
    one = jnp.asarray(1.0)
    args = (image, label, mask, key, one, one)

    if variant == "cost":
        lowered = step._fn.lower(state, *args)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        keep = {kk: v for kk, v in ca.items()
                if "bytes" in kk or kk in ("flops", "optimal_seconds")}
        print(json.dumps(keep, indent=2, default=float))
        ma = compiled.memory_analysis()
        print("memory_analysis:", ma)
        return

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
    sync(metrics)
    dt = (time.perf_counter() - t0) / (chunks * k)
    print(json.dumps({"variant": variant, "ms_per_step": round(dt * 1e3, 2),
                      "img_per_s": round(BS / dt, 1)}))


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "base")
