"""nkbx headline benchmark: ResNet-50 @224 bf16 training throughput (images/sec/chip).

Run on real TPU hardware by the driver; prints ONE JSON line.

Baseline note (BASELINE.md): the torch reference publishes NO numbers. The
north-star target is >=2x an A100 torch-AMP reference for ResNet-50 @224
single-task training. Public torch AMP ResNet-50 @224 training numbers on
A100 cluster in the 2,200-2,800 img/s band:
  - NVIDIA DeepLearningExamples ConvNets (ResNet-50 v1.5, AMP, DGX-A100
    single GPU): ~2,200-2,500 img/s depending on batch/container rev.
  - MLPerf Training v2.x/3.x ResNet-50 closed-division A100 submissions
    normalize to roughly ~2,500-2,800 img/s/GPU at scale.
We keep the round-1 driver-set midpoint 2,500 img/s as the denominator and
report the bracket here so ``vs_baseline`` is interpretable:
``vs_baseline`` = measured / 2500; the bracket maps 1.0x to [0.89x, 1.14x].

Capture-window design (round-4, after BENCH_r03 rc=124): the parent process
is a watchdog — it runs the measurement in a child (``--child``) with a hard
deadline and ALWAYS prints exactly one JSON line. The child enables JAX's
persistent compilation cache so a warm capture skips the ~5 min tunnel
compile; this repo warms the cache in-round. K (scan steps/dispatch)
defaults to 10 — the cheapest config that preserves the number (2,675 img/s
r3-measured vs 2,700 at K=20; K=20 via NKBX_BENCH_K=20 once warm).
"""

import json
import os
import sys
import time

A100_TORCH_REFERENCE_IPS = 2500.0  # img/s, torch AMP ResNet-50 @224 on A100 (see module docstring)
METRIC = "train images/sec/chip (ResNet-50 @224, bf16, incl. on-device augment)"
LAST_MEASURED = "last measured: 2700.7 img/s (PERF.md round 3)"


def main():
    import jax

    # Persistent compilation cache: a warm run compiles in seconds instead of
    # ~5 min through the tunnel. Must be set before the first computation.
    from nkbx.core import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    import nkbx.transforms as T
    from nkbx.models import get_model
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    # bs=128 aligns the batch with the 128-lane tiling XLA picks for the
    # batch-minor stem/stage-1 layouts: measured 2626 img/s vs 2548 at bs=256
    # and 2272 at bs=144 (r2 sweep, PERF.md)
    batch_size = 128
    model = get_model(
        {"task": "single", "model": "resnet50", "pretrained": False},
        classes=[f"c{i}" for i in range(1000)],
        input_size=(224, 224),
        dtype=jnp.bfloat16,
    )
    pipeline = T.Compose([
        T.HorizontalFlip(p=0.5),
        T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
    ])
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.1})
    # steps_per_dispatch: lax.scan K train steps per device dispatch — the
    # per-dispatch host round trip through the tunnel costs ~1 ms/step
    # otherwise. K=10 = 2,675 img/s, K=20 = 2,700 (r3 sweep, PERF.md); K=10
    # is the default so a cold capture compiles the smaller program.
    K = int(os.environ.get("NKBX_BENCH_K", "10"))
    train_step = build_train_step(model, criterion, bundle,
                                  augment_fn=pipeline.device_apply, scan_steps=K)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx)

    r = np.random.default_rng(0)
    image = jnp.asarray(np.broadcast_to(
        r.integers(0, 255, (batch_size, 224, 224, 3)).astype(np.uint8),
        (K, batch_size, 224, 224, 3)).copy())
    label = jnp.asarray(np.broadcast_to(
        r.integers(0, 1000, (batch_size,)).astype(np.int64), (K, batch_size)).copy())
    mask = jnp.ones((K, batch_size), bool)
    key = jax.random.PRNGKey(0)
    one = jnp.asarray(1.0)

    def sync(metrics):
        # never block_until_ready on donated outputs (returns early on this
        # backend); a dependent scalar fetch is the reliable sync
        return float(metrics["loss"][-1])

    # Compile, then SYNC IMMEDIATELY (fetch the loss) before dispatching more
    # work: queueing executions behind an in-flight compilation degrades the
    # tunneled-TPU session ~200x.
    state, metrics = train_step(state, image, label, mask, key, one, one)
    sync(metrics)
    state, metrics = train_step(state, image, label, mask, key, one, one)
    sync(metrics)

    # Timing: dispatch chunks async, then force ONE D2H on the final loss
    # (it depends on the whole state chain through every step).
    chunks = 4
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, metrics = train_step(state, image, label, mask, key, one, one)
    sync(metrics)
    dt = (time.perf_counter() - t0) / (chunks * K)

    ips = batch_size / dt
    print(json.dumps({
        "metric": METRIC,
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_TORCH_REFERENCE_IPS, 3),
    }))


def _fallback(error: str) -> None:
    print(json.dumps({
        "metric": METRIC,
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": f"{error}; {LAST_MEASURED}",
    }))


def _backend_alive(timeout_s: float) -> bool:
    """Probe the TPU backend in a subprocess (a dead tunnel HANGS device
    initialization indefinitely — a thread can't be cancelled, a process can)."""
    import subprocess

    code = "import jax, jax.numpy as jnp; print(float(jnp.ones(4).sum()))"
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _watchdog() -> None:
    """Run the measurement in a child with a hard deadline; guarantee ONE
    JSON line on stdout well inside the driver's capture window.

    Fast path (warm compile cache, healthy tunnel): child finishes in well
    under a minute and its JSON line is relayed verbatim. Deadline exceeded
    (cold cache — tunnel compiles take 2-6 min): print the explicit failure
    line immediately but LEAVE THE CHILD RUNNING detached — it finishes the
    compile, populates the persistent cache, and the next capture is warm
    (killing it would persist nothing and make a cold cache a permanent
    failure). Child exited without output: one short probe diagnoses
    tunnel-down vs other failure.
    """
    import subprocess
    import tempfile

    deadline_s = float(os.environ.get("NKBX_BENCH_WATCHDOG_S", "210"))
    probe_s = float(os.environ.get("NKBX_BENCH_PROBE_TIMEOUT_S", "90"))
    # child output goes to FILES, not pipes: an orphaned (deadline-exceeded)
    # child must keep running after this parent exits, and a closed pipe
    # would SIGPIPE it at its final print
    out_f = tempfile.NamedTemporaryFile("w+", suffix=".out", delete=False)
    err_f = tempfile.NamedTemporaryFile("w+", suffix=".err", delete=False)
    p = subprocess.Popen([sys.executable, os.path.abspath(__file__), "--child"],
                         stdout=out_f, stderr=err_f, start_new_session=True)
    try:
        p.wait(timeout=deadline_s)
    except subprocess.TimeoutExpired:
        # no probe here: it would contend with the still-compiling child
        _fallback(f"measurement exceeded watchdog deadline ({deadline_s:.0f}s; "
                  "cold compile cache? child left running to warm the "
                  "persistent cache for the next capture)")
        return
    # child exited: its output files are no longer needed after reading
    # (only the orphaned deadline-exceeded child keeps writing to them)
    try:
        out_f.seek(0)
        out = out_f.read()
        err_f.seek(0)
        err_tail = err_f.read().strip().splitlines()
    finally:
        for f in (out_f, err_f):
            try:
                f.close()
                os.unlink(f.name)
            except OSError:
                pass
    for line in reversed(out.splitlines()):
        if line.startswith("{"):
            print(line)
            return
    cause = ("TPU backend unavailable (tunnel down)"
             if not _backend_alive(probe_s)
             else f"measurement child exited rc={p.returncode} without a JSON line")
    _fallback(cause + (f" (stderr tail: {err_tail[-1][:200]})" if err_tail else ""))


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        _watchdog()
