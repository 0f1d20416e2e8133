"""Runtime init, precision policy, profiling (SURVEY.md §5.1-5.2 rebuild items).

The reference has no profiling/tracing at all (only tqdm bars) and no
multi-process story; nkbx provides:

- ``initialize()``: one-call setup — optional ``jax.distributed.initialize()``
  for multi-host TPU slices, persistent compilation cache, optional NaN
  debugging (the TPU-appropriate 'sanitizer', SURVEY.md §5.2);
- ``precision_policy()``: params fp32 / compute bf16 (the AMP analog);
- ``Throughput``: steps/sec + images/sec/chip counters for the train loop;
- ``profile_trace``: context manager around ``jax.profiler`` for TensorBoard
  traces.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache — warm process restarts skip the
    multi-minute TPU compile (a remote/tunneled-TPU compile of a real train
    step costs 2-6 min; a cache hit costs seconds). Every CLI entry point
    calls this by default (config key ``compilation_cache``: ``False``
    disables, a string overrides the directory). A
    ``JAX_COMPILATION_CACHE_DIR`` environment variable wins — jax already
    consumed it as the config default at import."""
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    path = path or os.path.expanduser("~/.cache/jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def enable_compilation_cache_from_cfg(cfg):
    """Entry-point glue for the ``compilation_cache`` config key: default ON,
    ``False`` disables, a string overrides the directory."""
    cc = cfg.get("compilation_cache", True)
    if cc is not False:
        enable_compilation_cache(cc if isinstance(cc, str) else None)


def initialize(distributed: bool = False, compilation_cache: str | None = None,
               debug_nans: bool = False, coordinator_address: str | None = None,
               num_processes: int | None = None, process_id: int | None = None):
    """Initialize the nkbx runtime. Call once, before building models/meshes."""
    if compilation_cache:
        os.makedirs(compilation_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", compilation_cache)
    if debug_nans:
        enable_nan_debugging()
    if distributed:
        kwargs = {}
        if coordinator_address:
            kwargs.update(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        jax.distributed.initialize(**kwargs)
    return {
        "backend": jax.default_backend(),
        "devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }


def precision_policy(enable_mixed_precision: bool = True):
    """(param_dtype, compute_dtype): fp32 params, bf16 compute when mixed.

    bf16 has the fp32 exponent range, so no loss scaling (the reference's
    GradScaler, train.py:37) is needed.
    """
    return jnp.float32, (jnp.bfloat16 if enable_mixed_precision else jnp.float32)


def enable_nan_debugging():
    """Opt-in NaN checking (jax_debug_nans) — SURVEY.md §5.2."""
    jax.config.update("jax_debug_nans", True)


@dataclass
class Throughput:
    """Steps/sec + images/sec/chip counter for the hot loop."""

    n_chips: int = 1
    _t0: float = field(default_factory=time.perf_counter)
    _steps: int = 0
    _images: int = 0

    def step(self, batch_size: int):
        self._steps += 1
        self._images += batch_size

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._images = 0

    def snapshot(self) -> dict:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {
            "steps_per_sec": self._steps / dt,
            "images_per_sec": self._images / dt,
            "images_per_sec_per_chip": self._images / dt / max(self.n_chips, 1),
            "elapsed_sec": dt,
        }


@contextlib.contextmanager
def profile_trace(log_dir: str, perfetto: bool = False):
    """TensorBoard-viewable device trace: ``with profile_trace('/tmp/tb'): ...``

    ``perfetto=True`` additionally writes a ``*.trace.json.gz`` that
    :func:`nkbx.core.profiling.aggregate_perfetto` turns into a per-kernel /
    per-category time breakdown (no TensorBoard needed)."""
    jax.profiler.start_trace(log_dir, create_perfetto_trace=perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
