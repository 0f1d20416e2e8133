"""Epoch metrics: balanced accuracy + per-class one-vs-rest ROC-AUC.

Bit-compatible with reference metrics.py:7-70 — the BASELINE requirement is
that eval numbers match the torch reference exactly, so the sklearn calls and
their NaN / class-absence semantics are reproduced one-for-one (and asserted
against the reference's own module in tests/test_metrics.py):

- multiclass (n_classes > 2): per-class OvR ROC-AUC on label-binarized ground
  truth, NaN for classes absent from the ground truth (warning emitted);
- binary: single ROC-AUC on the positive-class column, NaN if the ground truth
  is single-class;
- ``epoch_loss``: mean of the accumulated per-iteration losses.
"""

from __future__ import annotations

import warnings

import numpy as np

_GT_WARNING = (
    "\nNumber of classes in ground truth is less than number of classes "
    "in predicted confidences.\nSome of ROC AUC metric values will be NaN\n"
)


def _roc_auc(ground_truth, confidences: np.ndarray):
    """Reference ROC-AUC semantics (metrics.py:20-42): per-class OvR vector for
    multiclass, scalar for binary; NaN where the ground truth lacks a class."""
    from sklearn.metrics import roc_auc_score
    from sklearn.preprocessing import label_binarize

    n_classes = confidences.shape[1]
    present = np.unique(ground_truth)
    if len(present) < n_classes:
        warnings.warn(_GT_WARNING)

    if n_classes <= 2:
        if len(present) < 2:
            return np.nan
        return roc_auc_score(ground_truth, confidences[:, 1])

    per_class = np.full(n_classes, np.nan)
    if len(present) > 1:
        onehot = label_binarize(ground_truth, classes=range(n_classes))
        for cls in present:
            per_class[cls] = roc_auc_score(onehot[:, cls], confidences[:, cls])
    return per_class


def compute_targetwise_metrics(epoch_results, target_name=None):
    """Metrics for one target from accumulated per-sample epoch results."""
    from sklearn.metrics import balanced_accuracy_score

    def pick(key):
        v = epoch_results[key]
        return v if target_name is None else v[target_name]

    confidences = np.array(pick("confidences"))
    ground_truth = pick("ground_truth")
    return {
        "epoch_acc": balanced_accuracy_score(ground_truth, pick("predictions")),
        "epoch_roc_auc": _roc_auc(ground_truth, confidences),
        "epoch_loss": np.mean(pick("running_loss")),
    }


def compute_metrics(cfg, epoch_results: dict):
    """Single task -> one metric dict; multi -> per-target dicts + mean
    balanced accuracy (reference metrics.py:54-70). Consumes either the exact
    per-sample epoch results or the bounded device-side accumulation (the
    ``bounded_metrics`` key, see EpochCollector mode="bounded")."""
    task = cfg.task if hasattr(cfg, "task") else cfg["task"]
    bounded = epoch_results.get("bounded_metrics")

    if task == "single":
        out = dict(bounded) if bounded is not None else compute_targetwise_metrics(epoch_results)
        out["loss"] = epoch_results["running_loss"]
        return out

    if task == "multi":
        targets = cfg.target_names if hasattr(cfg, "target_names") else cfg["target_names"]
        if bounded is not None:
            out = {t: dict(bounded[t]) for t in targets}
        else:
            out = {t: compute_targetwise_metrics(epoch_results, t) for t in targets}
        out["loss"] = epoch_results["running_loss"]["loss"]
        out["epoch_acc"] = np.mean([out[t]["epoch_acc"] for t in targets])
        return out

    raise ValueError(f"Unknown task type {task} for metric computation")


# ---------------------------------------------------------------------------
# Bounded device-side accumulation (SURVEY.md §5.5)
# ---------------------------------------------------------------------------
#
# The exact path above retains per-sample arrays for the whole epoch — O(N*C)
# host memory (at ImageNet scale: ~5 GB of confidences). The bounded mode folds
# every batch into O(C^2 + C*N_BINS) device state inside the epoch:
#
# - confusion-matrix counts  -> balanced accuracy EXACTLY equal to sklearn's;
# - per-class positive/negative score histograms over N_BINS uniform bins of
#   [0, 1] -> tie-corrected ROC-AUC, exact for scores quantized to the bin
#   grid, within ~1/N_BINS of sklearn otherwise (documented tolerance);
# - loss sum/count.
#
# The fold is a jitted reduction: on a sharded multi-host batch the outputs are
# replicated by XLA (psum over the data axis), so bounded metrics are global
# by construction.

N_BINS = 8192


def make_bounded_state(n_classes: int):
    import jax.numpy as jnp

    return {
        "counts": jnp.zeros((n_classes, n_classes), jnp.int32),  # [true, pred]
        "pos_hist": jnp.zeros((n_classes, N_BINS), jnp.int32),
        "neg_hist": jnp.zeros((n_classes, N_BINS), jnp.int32),
        "loss_sum": jnp.zeros((), jnp.float32),
        "n_batches": jnp.zeros((), jnp.int32),
    }


def bounded_update(state, confidences, predictions, ground_truth, mask, loss):
    """One batch -> folded state (wrap in jax.jit; pure function).

    Accepts per-batch (B, ...) arrays or scan-stacked (K, B, ...) chunks
    (steps_per_dispatch > 1): everything is flattened to samples; the loss is
    a scalar or a (K,) per-step vector folded into loss_sum / n_batches.
    """
    import jax.numpy as jnp

    n_classes = state["counts"].shape[0]
    confidences = confidences.reshape(-1, n_classes)
    valid = mask.reshape(-1).astype(jnp.int32)
    gt = ground_truth.reshape(-1).astype(jnp.int32)
    pred = predictions.reshape(-1).astype(jnp.int32)
    loss = jnp.asarray(loss, jnp.float32)

    counts = state["counts"].at[gt, pred].add(valid)

    bins = jnp.clip((confidences * N_BINS).astype(jnp.int32), 0, N_BINS - 1)  # (B, C)
    cls = jnp.broadcast_to(jnp.arange(n_classes)[None, :], bins.shape)
    is_pos = (gt[:, None] == cls).astype(jnp.int32) * valid[:, None]
    is_neg = (gt[:, None] != cls).astype(jnp.int32) * valid[:, None]
    pos_hist = state["pos_hist"].at[cls, bins].add(is_pos)
    neg_hist = state["neg_hist"].at[cls, bins].add(is_neg)

    return {
        "counts": counts,
        "pos_hist": pos_hist,
        "neg_hist": neg_hist,
        "loss_sum": state["loss_sum"] + loss.sum(),
        "n_batches": state["n_batches"] + loss.size,
    }


def _auc_from_hists(pos, neg):
    """Tie-corrected ROC-AUC from score histograms (same formula sklearn's
    trapezoidal ROC integration reduces to on quantized scores)."""
    P, N = pos.sum(), neg.sum()
    if P == 0 or N == 0:
        return np.nan
    neg_below = np.concatenate([[0], np.cumsum(neg)[:-1]])
    return float((pos * (neg_below + 0.5 * neg)).sum() / (P * N))


def bounded_targetwise_metrics(state):
    """Finalize one target's folded state -> the compute_targetwise_metrics
    dict (epoch_acc / epoch_roc_auc / epoch_loss) with the same NaN and
    class-absence semantics as the exact sklearn path."""
    counts = np.asarray(state["counts"])
    pos = np.asarray(state["pos_hist"])
    neg = np.asarray(state["neg_hist"])
    n_classes = counts.shape[0]

    support = counts.sum(axis=1)
    present = support > 0
    with np.errstate(invalid="ignore"):
        recall = np.diag(counts) / support
    epoch_acc = float(np.mean(recall[present]))  # sklearn balanced_accuracy_score

    if present.sum() < n_classes:
        warnings.warn(_GT_WARNING)
    if n_classes <= 2:
        roc = np.nan if present.sum() < 2 else _auc_from_hists(pos[1], neg[1])
    else:
        roc = np.full(n_classes, np.nan)
        if present.sum() > 1:
            for c in np.nonzero(present)[0]:
                roc[c] = _auc_from_hists(pos[c], neg[c])
    return {
        "epoch_acc": epoch_acc,
        "epoch_roc_auc": roc,
        "epoch_loss": float(state["loss_sum"] / np.maximum(state["n_batches"], 1)),
    }
