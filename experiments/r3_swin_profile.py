"""Round-3: where does the swin_tiny fused train step's time go?

The fused-attention kernel took swin_tiny from 84.96 -> 61.39 ms/step
(bs=64 @224, PERF.md), but swin's MXU compute bound is ~7-10 ms — unlike
ResNet-50 (bandwidth-saturated at 99% of roofline) swin has real headroom.
This captures a device trace of the train step and aggregates per-kernel
time by category so the next optimization is aimed, not guessed.

Usage (chip idle, host quiet):
    python experiments/r3_swin_profile.py [trace]   # run + parse
    python experiments/r3_swin_profile.py parse     # re-parse existing trace
"""

import glob
import gzip
import json
import sys
from collections import defaultdict

TRACE_DIR = "/tmp/swin_trace"
BS = 64


def run_trace():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.models import swin as swin_mod
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = swin_mod.swin_tiny_patch4_window7_224(dtype=jnp.bfloat16,
                                                     fused_attention=True)
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


def categorize(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
        return "pallas attention"
    if n.startswith("copy") or ".copy" in n or "transpose" in n:
        return "copies/transposes"
    if "convolution" in n or "conv" in n:
        return "convs (patch embed / dW)"
    if "dot" in n:
        return "matmuls (qkv/proj/mlp/head)"
    if "reduce" in n:
        return "reduces (LN stats etc.)"
    if "fusion" in n:
        return "other fusions"
    if "dynamic" in n or "slice" in n or "concatenate" in n:
        return "slices/concats"
    return "misc"


def parse():
    files = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace.json.gz found under", TRACE_DIR)
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-side complete events: pid/tid names identify TPU tracks
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        track = pid_name.get(e.get("pid"), "")
        if "TPU" not in track and "tpu" not in track and "/device" not in track:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[e["name"]] += dur
        total += dur
    by_cat = defaultdict(float)
    for name, ms in by_name.items():
        by_cat[categorize(name)] += ms
    print(f"\ntotal device time (3 steps): {total:.1f} ms "
          f"(~{total / 3:.1f} ms/step)")
    print("\nby category (ms over 3 steps):")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:8.2f}  {cat}")
    print("\ntop 25 kernels:")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms:8.2f}  {name[:110]}")


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "trace"
    if arg == "trace":
        run_trace()
    parse()
