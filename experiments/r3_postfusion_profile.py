"""Round-3: per-kernel device profile of a family's train step under the
CURRENT shipped defaults (fused attention + fused MLP where default).

After the fused-MLP rollout (PERF.md), what remains in the convnext_tiny
(41.4 ms) and swin_tiny (52.5 ms) steps? Candidate next sinks: LayerNorm
round trips (each LN reads+writes the full (rows, C) tensor and its
backward re-reads it), residual adds, window partition copies, depthwise
convs. This decides whether a fused LN->MLP->residual kernel is worth
building.

Usage (chip idle, host quiet):
    python experiments/r3_postfusion_profile.py <family> [trace|parse]
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

BS = 64


def trace_dir(family):
    return f"/tmp/{family}_postfusion_trace"


def run_trace(family):
    import numpy as np
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.registry import create_backbone
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = create_backbone(family, dtype=jnp.bfloat16)
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

    jax.profiler.start_trace(trace_dir(family), create_perfetto_trace=True)
    for _ in range(3):
        state, metrics = step(state, *args)
    print("traced loss", float(metrics["loss"]))  # sync inside the trace
    jax.profiler.stop_trace()


def parse(family):
    from nkbx.core.profiling import aggregate_perfetto, format_breakdown

    agg = aggregate_perfetto(trace_dir(family))
    print(format_breakdown(agg, top=35))
    print(f"\n(~{agg['total_ms'] / 3:.1f} ms/step over the 3 traced steps)")


if __name__ == "__main__":
    family = sys.argv[1]
    arg = sys.argv[2] if len(sys.argv) > 2 else "trace"
    if arg == "trace":
        run_trace(family)
    parse(family)
