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
    balanced accuracy (reference metrics.py:54-70)."""
    task = cfg.task if hasattr(cfg, "task") else cfg["task"]

    if task == "single":
        out = compute_targetwise_metrics(epoch_results)
        out["loss"] = epoch_results["running_loss"]
        return out

    if task == "multi":
        targets = cfg.target_names if hasattr(cfg, "target_names") else cfg["target_names"]
        out = {t: compute_targetwise_metrics(epoch_results, t) for t in targets}
        out["loss"] = epoch_results["running_loss"]["loss"]
        out["epoch_acc"] = np.mean([out[t]["epoch_acc"] for t in targets])
        return out

    raise ValueError(f"Unknown task type {task} for metric computation")
