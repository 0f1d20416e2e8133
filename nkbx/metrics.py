"""Epoch metrics: balanced accuracy + per-class one-vs-rest ROC-AUC.

Bit-compatible with reference metrics.py:7-70 — literally the same sklearn calls
on the same accumulated per-sample values, including the NaN / class-absence
semantics:

- multiclass (n_classes > 2): per-class OvR ROC-AUC on the binarized ground
  truth; classes absent from GT stay NaN (with a warning);
- binary: ROC-AUC on confidences[:, 1]; NaN if only one class in GT;
- ``epoch_loss`` = mean of per-iteration losses.
"""

from __future__ import annotations

import warnings

import numpy as np


def compute_targetwise_metrics(epoch_results, target_name=None):
    if target_name is None:
        running_loss = epoch_results["running_loss"]
        confidences = epoch_results["confidences"]
        predictions = epoch_results["predictions"]
        ground_truth = epoch_results["ground_truth"]
    else:
        running_loss = epoch_results["running_loss"][target_name]
        confidences = epoch_results["confidences"][target_name]
        predictions = epoch_results["predictions"][target_name]
        ground_truth = epoch_results["ground_truth"][target_name]

    from sklearn.metrics import balanced_accuracy_score, roc_auc_score
    from sklearn.preprocessing import label_binarize

    confidences = np.array(confidences)
    n_classes = confidences.shape[1]
    gt_classes = np.unique(ground_truth)
    gt_n_classes = len(gt_classes)
    if gt_n_classes < n_classes:
        warnings.warn(
            "\nNumber of classes in ground truth is less than number of classes "
            "in predicted confidences.\nSome of ROC AUC metric values will be NaN\n"
        )

    epoch_acc = balanced_accuracy_score(ground_truth, predictions)

    if n_classes > 2:
        epoch_roc_auc = np.full(n_classes, np.nan)
        if gt_n_classes > 1:
            gt_bin = label_binarize(ground_truth, classes=range(n_classes))
            for gt_class in gt_classes:
                epoch_roc_auc[gt_class] = roc_auc_score(gt_bin[:, gt_class], confidences[:, gt_class])
    else:
        epoch_roc_auc = np.nan
        if gt_n_classes > 1:
            epoch_roc_auc = roc_auc_score(ground_truth, confidences[:, 1])

    return {
        "epoch_acc": epoch_acc,
        "epoch_roc_auc": epoch_roc_auc,
        "epoch_loss": np.mean(running_loss),
    }


def compute_metrics(cfg, epoch_results: dict):
    """Single task -> one metric dict; multi -> per-target dicts + mean epoch_acc
    (reference metrics.py:54-70)."""
    task = cfg.task if hasattr(cfg, "task") else cfg["task"]
    if task == "single":
        metrics = compute_targetwise_metrics(epoch_results)
        metrics["loss"] = epoch_results["running_loss"]
        return metrics
    if task == "multi":
        target_names = cfg.target_names if hasattr(cfg, "target_names") else cfg["target_names"]
        metrics = {t: compute_targetwise_metrics(epoch_results, t) for t in target_names}
        metrics["loss"] = epoch_results["running_loss"]["loss"]
        metrics["epoch_acc"] = np.mean([metrics[t]["epoch_acc"] for t in target_names])
        return metrics
    raise ValueError(f"Unknown task type {task} for metric computation")
