"""Checkpointing: Orbax best/last with FULL train-state resume.

Reference semantics (train.py:59-73): save best (by val balanced accuracy) and
last every epoch; "checkpoint" config key warm-starts weights only
(model.py:170-172). nkbx keeps that surface and adds what preemptible TPUs
require (SURVEY.md §5.3-5.4): optimizer state, step, epoch, and best-metric are
in the checkpoint, so ``--resume`` continues exactly where training stopped.

Layout under <run>/weights/:
    best/   orbax checkpoint (full train state + meta)
    last/   orbax checkpoint (full train state + meta)
"""

from __future__ import annotations

import shutil
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_save(state, epoch: int, best_val_acc: float):
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {
            "epoch": np.asarray(epoch, np.int32),
            "best_val_acc": np.asarray(best_val_acc, np.float64),
        },
    }
    # the EMA shadow must survive --resume (its recursion has epochs of
    # history); key present only when model_ema_decay > 0, so old checkpoints
    # and non-EMA runs keep their layout
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
        payload["ema_batch_stats"] = state.ema_batch_stats
    return payload


def _sync(tag: str):
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def save_checkpoint(path, state, epoch: int, best_val_acc: float = 0.0,
                    cursor: dict | None = None):
    """Crash-safe save: write to <path>.tmp, then atomically swap into place.

    The previous checkpoint stays intact until the new one is fully written
    (a preemption mid-save must never destroy the only resumable state). On
    multi-host runs, Orbax coordinates the save itself; the directory swap is
    done by process 0 between global barriers.

    ``cursor`` is the mid-epoch preemption cursor ({"epoch", "batch",
    "step", "batch_size", "process_count"}), written as an atomic sidecar
    ``<path>.cursor.json``; ``None`` (every end-of-epoch save) clears any
    stale sidecar. The sidecar pins the train-state ``step`` it was written
    against, so a cursor that doesn't match its checkpoint self-invalidates.
    """
    path = Path(path).resolve()
    tmp = path.with_name(path.name + ".tmp")
    if jax.process_index() == 0 and tmp.exists():
        shutil.rmtree(tmp)
    _sync("nkbx_ckpt_pre")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, _to_save(state, epoch, best_val_acc))
    _sync("nkbx_ckpt_post")
    if jax.process_index() == 0:
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)
        cursor_path = path.with_name(path.name + ".cursor.json")
        if cursor is None:
            cursor_path.unlink(missing_ok=True)
        else:
            import json

            ctmp = cursor_path.with_suffix(".json.tmp")
            ctmp.write_text(json.dumps(cursor))
            ctmp.rename(cursor_path)
    _sync("nkbx_ckpt_done")


def load_cursor(path) -> dict | None:
    """Read the mid-epoch preemption cursor sidecar, if present and parseable."""
    import json

    cursor_path = Path(path).resolve()
    cursor_path = cursor_path.with_name(cursor_path.name + ".cursor.json")
    if not cursor_path.exists():
        return None
    try:
        return json.loads(cursor_path.read_text())
    except (OSError, ValueError):
        return None


def restore_train_state(path, state_template, epoch: int = 0):
    """Full resume: returns (TrainState, epoch, best_val_acc)."""
    path = Path(path).resolve()
    template = _to_save(state_template, epoch, 0.0)

    def _copy(t):
        return jax.tree_util.tree_map(
            lambda x: x.copy() if hasattr(x, "copy") else x, t)

    with ocp.StandardCheckpointer() as ckptr:
        try:
            try:
                restored = ckptr.restore(path, template)
            except Exception:
                if "ema_params" in template:
                    # resuming a pre-EMA checkpoint into an EMA-enabled run:
                    # restore what exists; the EMA shadow restarts from the
                    # restored params
                    template.pop("ema_params")
                    template.pop("ema_batch_stats", None)
                    restored = ckptr.restore(path, template)
                    restored["ema_params"] = _copy(restored["params"])
                    restored["ema_batch_stats"] = _copy(restored["batch_stats"])
                else:
                    # resuming an EMA checkpoint into a non-EMA run: probe with
                    # EMA entries in the template, then discard them
                    template["ema_params"] = _copy(template["params"])
                    template["ema_batch_stats"] = _copy(template["batch_stats"])
                    restored = ckptr.restore(path, template)
                    restored.pop("ema_params", None)
                    restored.pop("ema_batch_stats", None)
        except Exception:
            # last resort: optimizer-state layout mismatch (e.g. a pre-r5
            # "nadam" checkpoint — its opt_state was optax nesterov-adam;
            # round 5's torch-exact NAdam carries count/mu_product/mu/nu).
            # Restore raw and graft weights + meta; moments restart fresh.
            raw = ckptr.restore(path)
            if not (isinstance(raw, dict) and "params" in raw and "meta" in raw):
                raise
            from nkbx.models.convert import adapt_variables_tree

            import warnings

            warnings.warn(
                f"checkpoint {path} has an optimizer state incompatible with "
                f"the current optimizer (layout change, e.g. pre-r5 nadam): "
                f"restored weights/step/meta, optimizer moments RESET")
            restored = dict(template)
            restored["params"] = adapt_variables_tree(
                raw["params"], template["params"], ("params",))
            if raw.get("batch_stats") and template.get("batch_stats"):
                restored["batch_stats"] = adapt_variables_tree(
                    raw["batch_stats"], template["batch_stats"], ("batch_stats",))
            restored["step"] = raw.get("step", template["step"])
            restored["meta"] = raw["meta"]
            if "ema_params" in template:
                restored["ema_params"] = (raw.get("ema_params")
                                          or _copy(restored["params"]))
                restored["ema_batch_stats"] = (raw.get("ema_batch_stats")
                                               or _copy(restored["batch_stats"]))
    new_state = state_template.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        ema_params=restored.get("ema_params", state_template.ema_params),
        ema_batch_stats=restored.get("ema_batch_stats", state_template.ema_batch_stats),
    )
    return new_state, int(restored["meta"]["epoch"]), float(restored["meta"]["best_val_acc"])


def load_model_variables(path, variables):
    """Weights-only warm start (reference model.py:170-172 analog).

    Accepts an orbax checkpoint dir (best/ or last/) or a flax msgpack file;
    restores 'params' (+ 'batch_stats') into the given variables dict.
    """
    from nkbx.models.convert import adapt_variables_tree

    path = Path(path)
    variables = dict(variables)
    if path.is_dir():
        with ocp.StandardCheckpointer() as ckptr:
            # restore raw (no template) and graft only the weight subtrees;
            # opt_state in the ckpt is ignored for a warm start
            restored = ckptr.restore(path.resolve())
    else:
        # msgpack fallback (nkbx.models.convert) — restore raw; the adapter
        # below does the structural/shape validation (and the ViT pos_embed
        # resample for input-size changes), which from_state_dict would not
        import flax.serialization

        with open(path, "rb") as f:
            restored = flax.serialization.msgpack_restore(f.read())
    # fit onto the model's template: shape-equal leaves pass through, a ViT
    # pos_embed saved at another input size is bicubically resampled (timm
    # img_size semantics — fine-tune a 224 checkpoint at 384), anything else
    # mismatched raises informatively instead of failing inside the jit
    variables["params"] = adapt_variables_tree(
        restored["params"], variables["params"], ("params",))
    if restored.get("batch_stats") and variables.get("batch_stats"):
        variables["batch_stats"] = adapt_variables_tree(
            restored["batch_stats"], variables["batch_stats"], ("batch_stats",))
    # A checkpoint carrying batch_stats the model has no slot for (e.g. a BN
    # family loaded into a stats-free one) is dropped, NOT grafted wholesale:
    # an architecture mismatch already failed loudly at the params adaptation
    # above, so surviving stats here are genuinely slotless.
    return variables


def save_model_msgpack(path, variables):
    """Portable single-file weight dump (params + batch_stats)."""
    import flax.serialization

    payload = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
    }
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
