"""Round-3: where does the convnext_tiny train step's time go?

The round-3 zoo refresh (PERF.md) measured convnext_tiny at 52.0 ms/step
(bs=64 @224 bf16, 1,231 img/s) — 1.9x slower than ResNet-50 at comparable
FLOPs (4.5 vs 4.1 GFLOP/img). The MXU bound for the dense mixing layers is
~8.8 ms/step, so most of the step is elsewhere. Candidate sinks: the 7x7
depthwise convs (VPU work, no MXU), LayerNorm reductions over the lane
dimension, and GELU(exact) transcendentals. Profile before attacking.

Usage (chip idle, host quiet):
    python experiments/r3_convnext_profile.py [trace]   # run + parse
    python experiments/r3_convnext_profile.py parse     # re-parse existing trace
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

TRACE_DIR = "/tmp/convnext_trace"
BS = 64


def run_trace():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.registry import create_backbone
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = create_backbone("convnext_tiny", dtype=jnp.bfloat16)
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
