"""Device-trace aggregation: per-kernel / per-category time from a profile.

The reference has no profiler at all (SURVEY.md §5.1 — torch users reach for
external nsight); on TPU the natural artifact is a ``jax.profiler`` trace.
``profile_trace(log_dir, perfetto=True)`` (nkbx.core.runtime) captures one;
this module turns the perfetto JSON it writes into the table that actually
answers "where does my step's time go" — summed device-kernel durations by
name and by category — without TensorBoard or the xplane tooling.

Used by experiments/r3_swin_profile.py for the swin_tiny breakdown in
PERF.md. CLI:

    python -m nkbx.core.profiling /tmp/tb        # newest trace under the dir
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict

__all__ = ["aggregate_perfetto", "categorize_kernel", "format_breakdown"]


def categorize_kernel(name: str) -> str:
    """Coarse buckets for XLA:TPU kernel names (heuristic, for triage)."""
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n:
        return "custom calls (Pallas)"
    if "copy" in n or "transpose" in n:
        return "copies/transposes"
    if "multiply_add" in n:
        return "multiply_add fusions (dW-style)"
    if "convert_reduce" in n:  # before "convolution": convert... != conv
        return "convert_reduce fusions (bwd+stats)"
    if "convolution" in n:
        return "convolutions"
    if n.startswith("fusion"):
        return "generic fusions"
    if "reduce" in n:
        return "reduces"
    if "dynamic" in n or "slice" in n or "concat" in n or n.startswith("pad"):
        return "slice/concat/pad"
    if n.startswith("dot") or "einsum" in n:
        return "plain dots"
    return "misc"


def _find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    files = sorted(glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        raise FileNotFoundError(
            f"no *.trace.json.gz under {path!r} — capture one with "
            f"nkbx.core.runtime.profile_trace(log_dir, perfetto=True)")
    return files[-1]


def aggregate_perfetto(path: str, device_substring: str = "/device:",
                       extra_category=None) -> dict:
    """Sum device-kernel durations from a perfetto trace.

    Args:
        path: a ``.trace.json.gz`` file, or a profiler log dir (newest trace
            under it is used).
        device_substring: keep events whose *process* track name contains
            this (``"/device:"`` matches TPU/GPU device tracks and skips the
            host python track).
        extra_category: optional ``name -> category|None`` hook tried before
            :func:`categorize_kernel` (return None to fall through) — lets a
            caller bucket its own kernels (e.g. ``attn.*`` -> "attention").

    Returns dict with ``total_ms``, ``by_name`` (kernel -> ms, the enclosing
    step/module spans excluded), and ``by_category``.
    """
    with gzip.open(_find_trace(path), "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    by_name: dict = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_substring not in pid_name.get(e["pid"], ""):
            continue
        # keep the op-level track; skip enclosing module/step spans, which
        # would double-count every kernel underneath them
        track = tid_name.get((e["pid"], e.get("tid")), "")
        if track in ("Steps", "XLA Modules"):
            continue
        by_name[e["name"]] += e.get("dur", 0) / 1e3  # us -> ms

    by_cat: dict = defaultdict(float)
    for name, ms in by_name.items():
        cat = extra_category(name) if extra_category else None
        by_cat[cat or categorize_kernel(name)] += ms
    return {
        "total_ms": sum(by_name.values()),
        "by_name": dict(sorted(by_name.items(), key=lambda kv: -kv[1])),
        "by_category": dict(sorted(by_cat.items(), key=lambda kv: -kv[1])),
    }


def format_breakdown(agg: dict, top: int = 20) -> str:
    total = agg["total_ms"] or 1e-9
    lines = [f"total device time: {agg['total_ms']:.2f} ms", "", "by category:"]
    for cat, ms in agg["by_category"].items():
        lines.append(f"  {ms:9.2f} ms  {100 * ms / total:5.1f}%  {cat}")
    lines += ["", f"top {top} kernels:"]
    for name, ms in list(agg["by_name"].items())[:top]:
        lines.append(f"  {ms:9.2f} ms  {name[:100]}")
    return "\n".join(lines)


if __name__ == "__main__":
    import sys

    print(format_breakdown(aggregate_perfetto(sys.argv[1])))
