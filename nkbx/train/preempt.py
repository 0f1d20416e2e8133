"""Preemption-safe checkpointing (SURVEY.md §5.3).

Preemptible/spot TPU VMs get a SIGTERM with a short grace window. The
reference's only resilience is checkpoint-every-epoch (train.py:66-73) —
an epoch can be hours, so a preemption loses it. nkbx installs a SIGTERM
handler (train.py CLI, config key ``preempt_checkpoint`` — default on) that
sets a flag; the engine's batch loop breaks at the next step boundary, the
trainer saves the FULL train state to ``weights/last`` together with a
batch-cursor sidecar (``last.cursor.json``), and the process exits cleanly.
``--resume`` then continues the interrupted epoch EXACTLY where the signal
hit: every sampler is a pure function of (seed, epoch) and the step PRNG
folds in the restored global step, so the resumed trajectory is bit-equal
to an uninterrupted run (tests/test_train_integration.py). A stale or
geometry-mismatched cursor self-invalidates and the epoch replays from its
beginning instead.

Multi-host: hosts receive signals independently, and a per-host mid-epoch
break at different steps would desynchronize the collectives — so on
``jax.process_count() > 1`` the engine OR-reduces the per-host flags
(:func:`agreed`) every ``preempt_sync_every`` batches (default 8; 0 reverts
to epoch-boundary-only): every host runs the collective at the same loop
index, so all take the same branch at the same step and the saved cursor is
globally consistent (tests/test_multiprocess.py). The trainer's
epoch-boundary check also goes through :func:`agreed`.
"""

from __future__ import annotations

import signal
import threading

_requested = False


def requested() -> bool:
    """True once a termination signal has been received (THIS host only)."""
    return _requested


def agreed() -> bool:
    """Global preemption decision (multi-host-safe).

    Signal delivery is per-host: if the SIGTERM lands while one host is past
    its epoch-boundary check, honoring the LOCAL flag would make that host
    break out of the epoch loop while the others enter the next epoch and
    hang on its first collective. So every host unconditionally all-gathers
    its 0/1 flag here and all take the OR — identical branch on every host.
    Single-process: just the local flag (no collective).
    """
    import jax

    if jax.process_count() == 1:
        return _requested
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray(_requested, np.int32))
    return bool(np.asarray(flags).any())


def reset() -> None:
    global _requested
    _requested = False


def _handler(signum, frame):
    global _requested
    _requested = True


def install(signals=(signal.SIGTERM,)) -> bool:
    """Install the flag-setting handler; returns False (no-op) off the main
    thread — signal handlers are a main-thread-only facility."""
    if threading.current_thread() is not threading.main_thread():
        return False
    for s in signals:
        signal.signal(s, _handler)
    return True
