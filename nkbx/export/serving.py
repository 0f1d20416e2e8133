"""TPUServingModule — batched inference runtime (the TRTModule analog).

Reference trtmodule.py:13-128 deserializes a TensorRT engine, rebinds buffers
per dynamic batch, and runs ``execute_v2``. Here the serving module loads a
.nkbx StableHLO bundle, and handles dynamic batch via **bucketed compilation**:
incoming batches are zero-padded up to the next bucket size (1, 2, 4, ..., max),
each bucket compiles once on first use (ahead-of-time warm-up available), and
results are sliced back. jit caching keys on shape, so steady-state serving is
one dispatch with zero recompiles.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nkbx.export.stablehlo import load_exported


def default_buckets(max_batch: int) -> list:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


class TPUServingModule:
    """Load a .nkbx bundle and serve batched inference with bucket padding."""

    def __init__(self, weight, device=None, buckets: Optional[Sequence[int]] = None,
                 warm_up_on_load: bool = True):
        self.metadata, self._exported = load_exported(weight)
        self.classes = self.metadata.get("classes")
        self.task = self.metadata.get("task", "single")
        max_batch = int(self.metadata.get("batch", 32)) or 32
        dim0 = self._exported.in_avals[0].shape[0]
        if isinstance(dim0, int):
            # fixed-batch export (--dynamic none): the program accepts exactly
            # one batch size — pad/chunk everything to it
            self.buckets = [dim0]
        else:
            self.buckets = sorted(buckets) if buckets else default_buckets(max_batch)
        self.device = device or jax.devices()[0]
        self._call = jax.jit(self._exported.call)
        if warm_up_on_load:
            # compile every bucket NOW: a cold bucket mid-serving is a multi-
            # minute stall on tunneled TPUs (pass warm_up_on_load=False to
            # defer, e.g. when only benchmarking one batch size)
            self.warm_up()

    # -- core ---------------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def forward(self, im):
        """Run a uint8/float NHWC batch; returns logits (array or {target: array})."""
        x = np.asarray(im)
        if x.ndim == 3:
            x = x[None]
        n = x.shape[0]
        bucket = self._bucket_for(n)
        if n > bucket:  # larger than the largest bucket: chunk
            outs = [self.forward(x[i:i + bucket]) for i in range(0, n, bucket)]
            if isinstance(outs[0], dict):
                return {k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]}
            return jnp.concatenate(outs)
        if n < bucket:
            pad = np.zeros((bucket - n, *x.shape[1:]), dtype=x.dtype)
            x = np.concatenate([x, pad])
        out = self._call(jnp.asarray(x, dtype=self._exported.in_avals[0].dtype))
        if isinstance(out, (tuple, list)):
            out = out[0] if len(out) == 1 else out
        if isinstance(out, dict):
            return {k: v[:n] for k, v in out.items()}
        return out[:n]

    __call__ = forward

    # -- ops ----------------------------------------------------------------

    @staticmethod
    def _sync(out):
        """Reliable completion sync: fetch a scalar that depends on the output
        (block_until_ready can return early on tunneled-TPU backends)."""
        leaf = out[next(iter(out))] if isinstance(out, dict) else out
        return float(jnp.ravel(leaf)[0])

    def warm_up(self, batches: Optional[Sequence[int]] = None):
        """AOT-compile every bucket (TRT builds profiles at export; we compile here)."""
        h, w = self.metadata["imgsz"]
        for b in batches or self.buckets:
            x = np.zeros((b, h, w, 3), dtype=np.float32)
            self._sync(self.forward(x))

    def benchmark(self, batch_size: int = 32, iters: int = 100):
        """p50/p99 latency + throughput for one bucket (trtmodule.py:117-124,
        but actually measuring).

        Reports two tiers: ``p50_ms``/``p99_ms`` time the full ``forward``
        (host input -> H2D -> compute -> D2H sync), while ``compute_p50_ms``
        stages the input on device once and times only the compiled program.
        On tunneled dev TPUs the end-to-end numbers are dominated by the
        tunnel's host<->device link; production hosts move batches over PCIe.
        """
        h, w = self.metadata["imgsz"]
        x = np.random.default_rng(0).random((batch_size, h, w, 3), dtype=np.float32)
        self._sync(self.forward(x))  # compile

        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            self._sync(self.forward(x))
            times.append(time.perf_counter() - t0)
        times = np.asarray(times)

        xd = jnp.asarray(x, dtype=self._exported.in_avals[0].dtype)
        self._sync(self._call(xd))
        ctimes = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = self._call(xd)
            self._sync(out)
            ctimes.append(time.perf_counter() - t0)
        ctimes = np.asarray(ctimes)

        # queue-pressure tier: issue all dispatches back-to-back and sync once
        # at the end (the device executes its stream in order, so syncing the
        # last output bounds them all). This is what a LOADED serving queue
        # sees — the per-dispatch host round trip (~25 ms through the dev
        # tunnel) overlaps the device compute instead of serializing with it.
        self._sync(self._call(xd))
        t0 = time.perf_counter()
        outs = [self._call(xd) for _ in range(iters)]
        self._sync(outs[-1])
        pipelined = (time.perf_counter() - t0) / iters

        return {
            "batch_size": batch_size,
            "p50_ms": float(np.percentile(times, 50) * 1e3),
            "p99_ms": float(np.percentile(times, 99) * 1e3),
            "images_per_sec": float(batch_size / np.median(times)),
            "compute_p50_ms": float(np.percentile(ctimes, 50) * 1e3),
            "compute_p99_ms": float(np.percentile(ctimes, 99) * 1e3),
            "compute_images_per_sec": float(batch_size / np.median(ctimes)),
            "pipelined_ms": float(pipelined * 1e3),
            "pipelined_images_per_sec": float(batch_size / pipelined),
        }

    def benchmark_sweep(self, batch_sizes: Optional[Sequence[int]] = None,
                        iters: int = 50):
        """Latency-vs-throughput curve across buckets, with pad-miss costs.

        Returns one :meth:`benchmark` row per batch size (default: every
        bucket). Each row after the first also carries
        ``pad_miss_vs_prev_ms``: serving ``prev_bucket + 1`` images lands in
        THIS bucket, so the request pays this row's latency instead of the
        previous row's — that difference is the bucket-miss (padding) cost
        the bucket layout should be chosen around (see PERF.md round-5
        serving-curve section for measured guidance).
        """
        sizes = sorted(batch_sizes or self.buckets)
        rows = [self.benchmark(b, iters) for b in sizes]
        for prev, row in zip(rows, rows[1:]):
            row["pad_miss_vs_prev_ms"] = round(
                row["compute_p50_ms"] - prev["compute_p50_ms"], 3)
            # on tunneled dev backends compute_p50 is pinned at the dispatch
            # round trip, so the pipelined delta is the honest pad cost there
            row["pad_miss_pipelined_ms"] = round(
                row["pipelined_ms"] - prev["pipelined_ms"], 3)
        return rows


class ExportedModel:
    """ClassificationModel-shaped adapter over a serving bundle, so eval.py /
    inference.py accept ``model: {"scripted": True, "checkpoint": "*.nkbx"}``
    configs (reference model.py:163-164 surface)."""

    class _ModuleShim:
        def __init__(self, serving):
            self._serving = serving

        def apply(self, variables, x, train=False, **kw):
            return self._serving.forward(x)

    def __init__(self, path):
        self.serving = TPUServingModule(path)
        self.module = ExportedModel._ModuleShim(self.serving)
        self.variables = {"params": {}}
        self.classes = self.serving.classes
        self.task = self.serving.task
        self.params = {}
        self.batch_stats = {}

    def apply(self, variables, x, train=False, rngs=None):
        return self.serving.forward(x)

    def __call__(self, x, train=False, rngs=None):
        return self.serving.forward(x)


def main():  # pragma: no cover - thin CLI
    """Serving-side benchmark CLI (the reference trtmodule.py __main__ analog,
    trtmodule.py:117-124 — but it reports numbers)."""
    import argparse
    import json

    parser = argparse.ArgumentParser(description="nkbx serving benchmark")
    parser.add_argument("weights", help=".nkbx serving bundle")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--sweep", nargs="*", type=int, default=None,
                        help="benchmark a latency/throughput curve instead of "
                             "one batch: every bucket (bare --sweep) or the "
                             "given batch sizes (--sweep 1 8 32 128); prints "
                             "one JSON line per row incl. pad-miss costs")
    args = parser.parse_args()
    module = TPUServingModule(args.weights, warm_up_on_load=False)
    if args.sweep is not None:
        for row in module.benchmark_sweep(args.sweep or None, args.iters):
            print(json.dumps(row))
    else:
        module.warm_up([args.batch_size])  # only the benchmarked bucket
        print(json.dumps(module.benchmark(args.batch_size, args.iters)))


if __name__ == "__main__":  # pragma: no cover
    main()
