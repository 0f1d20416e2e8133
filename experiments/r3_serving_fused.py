"""Round-3: fused-attention serving bundles (export.py --fused-attention).

The default .nkbx bundle force-disables the Pallas window-attention kernel
(portable StableHLO, no custom calls). export_model(fused_attention=True)
keeps it — a TPU-only artifact — which should carry the kernel's training-
side win (+44% swin_tiny, PERF.md) over to serving compute throughput.

Measures TPUServingModule compute-only p50 (the tunnel-independent tier of
serving.benchmark) for swin_tiny bundles exported both ways.

Usage: python experiments/r3_serving_fused.py {fused|xla} [bs] [family]
one variant per invocation, chip idle (CLAUDE.md).

Measured (2026-08-17, PERF.md "fused-attention serving bundles"), bs=32:
  xla   compute p50 47.7 ms -> 671 img/s
  fused compute p50 43.3 ms -> 739 img/s (+10% through the tunnel's ~25 ms
  per-dispatch round trip; net device forward ~23 -> ~18 ms, ~+25%)

Re-measured after the LN+MLP fusion landed (the fused bundle embeds every
Pallas kernel, not just attention) — see PERF.md "LN-fusion" section.
"""

import json
import sys
import tempfile
import time

import numpy as np

BS = 32
FAMILY = "swin_tiny_patch4_window7_224"


def run(variant):
    import jax
    import jax.numpy as jnp

    from nkbx.export.serving import TPUServingModule
    from nkbx.export.stablehlo import export_model
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.registry import _REGISTRY

    backbone = _REGISTRY[FAMILY](dtype=jnp.bfloat16)
    module = SingletaskClassifier(backbone=backbone, n_classes=1000)
    init = jax.jit(lambda rng: module.init(
        {"params": rng}, jnp.zeros((1, 224, 224, 3), jnp.float32), train=False))
    variables = dict(init(jax.random.PRNGKey(0)))
    model = ClassificationModel(module, variables,
                                [f"c{i}" for i in range(1000)], "single",
                                backbone.num_features)

    with tempfile.TemporaryDirectory() as d:
        path, _ = export_model(model, (BS, 224, 224, 3), f"{d}/m.nkbx",
                               dynamic="none",
                               fused_attention=(variant == "fused"))
        mod = TPUServingModule(path, warm_up_on_load=False)
        out = mod.benchmark(batch_size=BS, iters=30)
    out["variant"] = variant
    out["family"] = FAMILY
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 2:
        BS = int(sys.argv[2])
    if len(sys.argv) > 3:
        FAMILY = sys.argv[3]
    run(sys.argv[1])
