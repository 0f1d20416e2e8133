"""Experiment tracking: local CSV/PNG artifacts + optional Comet ML.

Same artifact contract as reference logging.py:

- run dir auto-deduplicated by numeric suffix, ``weights/`` subdir
  (logging.py:56-66);
- ``metrics.csv``: tab-separated, Epoch first then alphabetized columns,
  rewritten every log call (logging.py:26-34);
- ``classes.json`` saved at logger init (logging.py:323);
- image grids un-normalized... not needed here: nkbx logs the raw uint8 batch
  (we keep images in uint8 until the device stage, so no un-normalize dance,
  cf. logging.py:191-203);
- Comet ML optional: metrics, image grids, confusion matrices, gradient norms
  (logging.py:41-53,142-215). comet_ml is imported lazily and failure to import
  degrades to local-only logging.
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Sequence
from pathlib import Path

import numpy as np

from nkbx.utils import save_classes, sort_df_columns_titled


class LocalExperiment:
    def __init__(self, path=""):
        import pandas as pd

        self.path = Path(path)
        self.metrics = pd.DataFrame([], columns=["Epoch"])

    def log_image(self, image, name="", step=0):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        plt.imsave(self.path / f"{name}_{step}.png", arr)

    def log_metric(self, name, value, epoch=0, step=None, prefix=None):
        if prefix is not None:
            name = f"{prefix}/{name}"
        if isinstance(value, Sequence) and not isinstance(value, str):
            value = np.mean(value)
        self.metrics.loc[epoch, name] = value
        # Epoch = the row's actual epoch index (the reference writes
        # range(len(df)), logging.py:32, which mislabels resumed runs)
        self.metrics.loc[:, "Epoch"] = self.metrics.index
        self.metrics = sort_df_columns_titled(self.metrics)
        self.metrics.to_csv(self.path / "metrics.csv", index=False, sep="\t")

    def log_metrics(self, metrics_dict, epoch=0, step=None, prefix=None):
        for name, value in metrics_dict.items():
            self.log_metric(name, value, epoch=epoch, prefix=prefix)


def get_local_experiment(cfg_exp):
    assert cfg_exp is not None and "path" in cfg_exp
    exp_path = Path(cfg_exp["path"])
    dir_duplicate_num = 1
    while exp_path.exists():  # dedup run dir by numeric suffix
        exp_path = Path(str(cfg_exp["path"]) + str(dir_duplicate_num))
        dir_duplicate_num += 1
    exp_path.mkdir(parents=True)
    (exp_path / "weights").mkdir()
    return LocalExperiment(exp_path)


def get_comet_experiment(cfg_exp):
    """Comet ML experiment from a side YAML with api_key/workspace/project_name
    (reference logging.py:41-53). Returns None if disabled or comet_ml missing."""
    if cfg_exp is None:
        return None
    try:
        from comet_ml import Experiment as CometExperiment
    except ImportError:
        import warnings

        warnings.warn("comet_ml is not installed; continuing with local logging only")
        return None
    import yaml

    cfg_exp = dict(cfg_exp)
    api_cfg_path = cfg_exp.pop("comet_api_cfg_path")
    with open(api_cfg_path, "r") as f:
        comet_cfg = yaml.safe_load(f)
    cfg_exp["api_key"] = comet_cfg["api_key"]
    cfg_exp["workspace"] = comet_cfg["workspace"]
    cfg_exp["project_name"] = comet_cfg["project_name"]
    name = cfg_exp.pop("name")
    exp = CometExperiment(**cfg_exp)
    exp.set_name(name)
    return exp


# ---------------------------------------------------------------------------
# Grids + metric fan-out (reference logging.py:69-215)
# ---------------------------------------------------------------------------


def make_image_grid(batch, nrow=8, padding=2):
    """uint8 NHWC batch -> one grid image (torchvision.utils.make_grid analog)."""
    batch = np.asarray(batch)
    n, h, w, c = batch.shape
    ncol = min(nrow, n)
    nr = -(-n // ncol)
    grid = np.zeros((nr * (h + padding) + padding, ncol * (w + padding) + padding, c), dtype=batch.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = batch[i]
    return grid


def log_images(experiment, name, epoch, batch_to_log):
    if batch_to_log is None:
        return
    experiment.log_image(make_image_grid(batch_to_log), name=name, step=epoch)


def log_targetwise_metrics(experiment, target_name, classes, epoch, metrics, fold="train"):
    if target_name is None:
        target_name = ""
    acc = metrics["epoch_acc"]
    roc_auc = metrics["epoch_roc_auc"]
    epoch_loss = metrics["epoch_loss"]
    n_classes = len(classes)
    experiment.log_metric(f"{target_name} Average epoch {fold} loss".lstrip(), epoch_loss, epoch=epoch, step=epoch)
    if n_classes > 2:
        for roc_auc_, class_name in zip(roc_auc, classes):
            experiment.log_metric(f"{target_name} {fold} ROC AUC, {class_name}".lstrip(), roc_auc_, epoch=epoch, step=epoch)
        mean_roc_auc = np.nan if np.all(np.isnan(roc_auc)) else np.nanmean(roc_auc)
        experiment.log_metric(f"{target_name} {fold} ROC AUC".lstrip(), mean_roc_auc, epoch=epoch, step=epoch)
    else:
        experiment.log_metric(f"{target_name} {fold} ROC AUC".lstrip(), roc_auc, epoch=epoch, step=epoch)
    experiment.log_metric(f"{target_name} {fold} balanced accuracy".lstrip(), acc, epoch=epoch, step=epoch)


def log_metrics(experiment, target_names, classes, epoch, metrics, fold="train"):
    if target_names is None:
        log_targetwise_metrics(experiment, None, classes, epoch, metrics, fold)
    else:
        for t in target_names:
            log_targetwise_metrics(experiment, t, classes[t], epoch, metrics[t], fold)
    experiment.log_metric(f"{fold} loss", np.mean(metrics["loss"]), epoch=epoch, step=epoch)
    experiment.log_metric(f"{fold} balanced accuracy", metrics["epoch_acc"], epoch=epoch, step=epoch)


def log_confusion_matrices(experiment, target_names, classes, epoch, results, fold="validation", show_all=False):
    default_max = 25
    if "bounded_metrics" in results:
        # bounded accumulation keeps no per-sample arrays; the folded
        # confusion-matrix counts ARE the matrix — log them directly
        counts = results["confusion_counts"]
        items = [(None, counts)] if target_names is None else [(t, counts[t]) for t in target_names]
        for t, m in items:
            cls = classes if t is None else classes[t]
            tag = f"{fold} {t} " if t else f"{fold} "
            experiment.log_confusion_matrix(
                matrix=np.asarray(m).tolist(),
                labels=tuple(map(str, cls)),
                max_categories=len(cls) if show_all else default_max,
                title=f"{tag}confusion matrix".replace("  ", " "),
                file_name=f"{tag.strip().replace(' ', '-')}-confusion-matrix.json",
                epoch=epoch,
            )
        return
    if target_names is None:
        experiment.log_confusion_matrix(
            results["ground_truth"], results["predictions"],
            labels=tuple(map(str, classes)),
            max_categories=len(classes) if show_all else default_max,
            title=f"{fold} confusion matrix",
            file_name=f"{fold}-confusion-matrix.json",
            epoch=epoch,
        )
    else:
        for t in target_names:
            experiment.log_confusion_matrix(
                results["ground_truth"][t], results["predictions"][t],
                labels=tuple(map(str, classes[t])),
                max_categories=len(classes[t]) if show_all else default_max,
                title=f"{fold} {t} confusion matrix",
                file_name=f"{fold}-{t}-confusion-matrix.json",
                epoch=epoch,
            )


def log_grads(experiment, epoch, metrics_grad_log):
    for key, values in metrics_grad_log.items():
        experiment.log_metric(key, float(np.nanmean(values)), epoch=epoch, step=epoch)
    return defaultdict(list)


class TrainLogger:
    """Epoch-level observability (reference logging.py:297-377): classes.json at
    init, startup image grids, local CSV + optional Comet per epoch."""

    def __init__(self, cfg, comet_experiment, local_experiment, classes):
        assert cfg.task in ("single", "multi")
        self.cfg = cfg
        self.task = cfg.task
        self.classes = classes
        self.target_names = sorted(classes) if self.task == "multi" else None
        self.comet_experiment = comet_experiment
        self.local_experiment = local_experiment
        self.show_full_conf_matrix = getattr(cfg, "show_all_classes_in_confusion_matrix", False)
        save_classes(self.classes, self.local_experiment.path / "classes.json")

    def log_images_at_start(self, loader, n_batches=3):
        for batch_num, batch in enumerate(loader.epoch(0)):
            if batch_num + 1 > n_batches:
                break
            log_images(self.local_experiment, "train_batch", batch_num + 1, batch["image"])

    def log_epoch(self, epoch, train_results, val_results):
        log_metrics(self.local_experiment, self.target_names, self.classes, epoch,
                    train_results["metrics"], "train")
        log_metrics(self.local_experiment, self.target_names, self.classes, epoch,
                    val_results["metrics"], "Val")
        if self.comet_experiment is not None:
            log_images(self.comet_experiment, "train", epoch, train_results["images"])
            log_images(self.comet_experiment, "validation", epoch, val_results["images"])
            log_metrics(self.comet_experiment, self.target_names, self.classes, epoch,
                        train_results["metrics"], "train")
            log_metrics(self.comet_experiment, self.target_names, self.classes, epoch,
                        val_results["metrics"], "validation")
            log_confusion_matrices(self.comet_experiment, self.target_names, self.classes,
                                   epoch, val_results, "validation", self.show_full_conf_matrix)
            if getattr(self.cfg, "log_gradients", False) and "metrics_grad_log" in train_results:
                log_grads(self.comet_experiment, epoch, train_results["metrics_grad_log"])
