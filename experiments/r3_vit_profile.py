"""Round-3: where does the vit_base_patch16_224 train step's time go?

The fused-window-attention sweep left ViT on XLA attention (the Pallas
window kernel measured -7% at N=197, PERF.md). But ViT-B/16's MXU compute
bound is ~17 ms (3 x 17.6 GFLOP/img x 64 / 197 TFLOP/s) against a measured
60.78 ms/step (bs=64 @224 bf16) — a 3.5x gap. Before attempting any kernel,
profile: aggregate the device trace per category so the next move is aimed.

Usage (chip idle, host quiet):
    python experiments/r3_vit_profile.py [trace]   # run + parse
    python experiments/r3_vit_profile.py parse     # re-parse existing trace
"""

import sys

TRACE_DIR = "/tmp/vit_trace"
BS = 64


def run_trace():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models import vit as vit_mod
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = vit_mod.vit_base_patch16_224(dtype=jnp.bfloat16)
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
                            augment_fn=pipeline.device_apply, scan_steps=1)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx)

    r = np.random.default_rng(0)
    image = jnp.asarray(r.integers(0, 255, (BS, 224, 224, 3)).astype(np.uint8))
    label = jnp.asarray(r.integers(0, 1000, (BS,)).astype(np.int64))
    mask = jnp.ones((BS,), bool)
    key = jax.random.PRNGKey(0)
    one = jnp.asarray(1.0)
    args = (image, label, mask, key, one, one)

    state, metrics = step(state, *args)
    print("warm loss", float(metrics["loss"]))  # sync after compile
    state, metrics = step(state, *args)
    print("warm2", float(metrics["loss"]))

    jax.profiler.start_trace(TRACE_DIR, create_perfetto_trace=True)
    for _ in range(3):
        state, metrics = step(state, *args)
    print("traced loss", float(metrics["loss"]))  # sync inside the trace
    jax.profiler.stop_trace()


def parse():
    from nkbx.core.profiling import aggregate_perfetto, format_breakdown

    agg = aggregate_perfetto(TRACE_DIR)
    print(format_breakdown(agg, top=30))
    print(f"\n(~{agg['total_ms'] / 3:.1f} ms/step over the 3 traced steps)")


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "trace"
    if arg == "trace":
        run_trace()
    parse()
