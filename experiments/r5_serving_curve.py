"""Round-5 serving throughput-vs-latency curve (VERDICT r4 task #6).

One table for the serving story: compute p50/p99, img/s, and the PIPELINED
(queue-pressure) throughput across buckets {1, 8, 32, 128} for resnet50 and
swin_tiny — the swin rows both as the portable default bundle and the
TPU-only `--fused-attention` bundle — plus the bucket-miss (pad) cost
between adjacent buckets (TPUServingModule.benchmark_sweep).

Discipline: chip idle, one bundle measured at a time, sequential in one
process (never concurrent). Dynamic-batch bundles sweep buckets
{1,8,32,128} in one module; the fused bundle requires --dynamic none, so it
is exported per batch size (its kernel block picker needs concrete window
counts).

Usage:
  python experiments/r5_serving_curve.py resnet50
  python experiments/r5_serving_curve.py swin
  python experiments/r5_serving_curve.py swin_fused [bs]
"""

import json
import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

BUCKETS = [1, 8, 32, 128]


def build(family):
    import jax
    import jax.numpy as jnp

    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.registry import _REGISTRY

    backbone = _REGISTRY[family](dtype=jnp.bfloat16)
    module = SingletaskClassifier(backbone=backbone, n_classes=1000)
    init = jax.jit(lambda rng: module.init(
        {"params": rng}, jnp.zeros((1, 224, 224, 3), jnp.float32), train=False))
    variables = dict(init(jax.random.PRNGKey(0)))
    return ClassificationModel(module, variables,
                               [f"c{i}" for i in range(1000)], "single",
                               backbone.num_features)


def sweep_dynamic(family):
    from nkbx.export.serving import TPUServingModule
    from nkbx.export.stablehlo import export_model

    model = build(family)
    with tempfile.TemporaryDirectory() as d:
        path, _ = export_model(model, (128, 224, 224, 3), f"{d}/m.nkbx",
                               dynamic="batch")
        mod = TPUServingModule(path, buckets=BUCKETS, warm_up_on_load=False)
        for row in mod.benchmark_sweep(BUCKETS, iters=30):
            row["family"] = family
            row["bundle"] = "default"
            print(json.dumps(row), flush=True)


def swin_fused(bs):
    from nkbx.export.serving import TPUServingModule
    from nkbx.export.stablehlo import export_model

    family = "swin_tiny_patch4_window7_224"
    model = build(family)
    with tempfile.TemporaryDirectory() as d:
        path, _ = export_model(model, (bs, 224, 224, 3), f"{d}/m.nkbx",
                               dynamic="none", fused_attention=True)
        mod = TPUServingModule(path, warm_up_on_load=False)
        row = mod.benchmark(batch_size=bs, iters=30)
        row["family"] = family
        row["bundle"] = "fused-attention"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    what = sys.argv[1]
    if what == "resnet50":
        sweep_dynamic("resnet50")
    elif what == "swin":
        sweep_dynamic("swin_tiny_patch4_window7_224")
    elif what == "swin_fused":
        swin_fused(int(sys.argv[2]) if len(sys.argv) > 2 else 32)
    else:
        raise SystemExit(f"unknown target {what}")
