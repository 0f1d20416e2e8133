"""Logging fan-out: metric names, CSV layout, grids, confusion-matrix calls —
the reference's observability contract (logging.py:69-215)."""

import numpy as np
import pytest

from nkbx.logging import (
    LocalExperiment,
    get_local_experiment,
    log_confusion_matrices,
    log_metrics,
    make_image_grid,
)


class FakeExperiment:
    def __init__(self):
        self.metrics = {}
        self.confusion = []
        self.images = []

    def log_metric(self, name, value, epoch=0, step=None):
        self.metrics[name] = value

    def log_confusion_matrix(self, gt, pred, labels=None, max_categories=None,
                             title=None, file_name=None, epoch=None):
        self.confusion.append({"labels": labels, "max_categories": max_categories,
                               "title": title, "file_name": file_name})

    def log_image(self, image, name="", step=0):
        self.images.append((name, np.asarray(image).shape))


def _single_metrics(n_classes=3):
    return {
        "epoch_acc": 0.75,
        "epoch_roc_auc": np.array([0.9, np.nan, 0.7])[:n_classes],
        "epoch_loss": 0.42,
        "loss": [0.5, 0.34],
    }


class TestMetricNames:
    def test_single_task_names(self):
        exp = FakeExperiment()
        log_metrics(exp, None, ["a", "b", "c"], epoch=1, metrics=_single_metrics(), fold="train")
        # exact reference names (logging.py:78-153)
        assert "Average epoch train loss" in exp.metrics
        assert "train ROC AUC, a" in exp.metrics
        assert "train ROC AUC" in exp.metrics  # nanmean over classes
        assert exp.metrics["train ROC AUC"] == pytest.approx(0.8)
        assert "train balanced accuracy" in exp.metrics
        assert exp.metrics["train loss"] == pytest.approx(np.mean([0.5, 0.34]))

    def test_binary_task_scalar_roc(self):
        exp = FakeExperiment()
        m = {"epoch_acc": 0.5, "epoch_roc_auc": 0.66, "epoch_loss": 1.0, "loss": [1.0]}
        log_metrics(exp, None, ["x", "y"], epoch=0, metrics=m, fold="Val")
        assert exp.metrics["Val ROC AUC"] == 0.66

    def test_multi_task_names(self):
        exp = FakeExperiment()
        metrics = {
            "color": _single_metrics(),
            "size": {"epoch_acc": 0.6, "epoch_roc_auc": 0.55, "epoch_loss": 0.3},
            "loss": [0.8],
            "epoch_acc": 0.675,
        }
        classes = {"color": ["r", "g", "b"], "size": ["s", "l"]}
        log_metrics(exp, ["color", "size"], classes, epoch=0, metrics=metrics, fold="validation")
        assert "color Average epoch validation loss" in exp.metrics
        assert "color validation ROC AUC, r" in exp.metrics
        assert "size validation ROC AUC" in exp.metrics
        assert exp.metrics["validation balanced accuracy"] == 0.675


class TestConfusionMatrices:
    def test_single(self):
        exp = FakeExperiment()
        results = {"ground_truth": [0, 1], "predictions": [0, 0]}
        log_confusion_matrices(exp, None, ["a", "b"], 0, results, "validation", show_all=False)
        assert exp.confusion[0]["file_name"] == "validation-confusion-matrix.json"

    def test_multi_cap_25(self):
        exp = FakeExperiment()
        classes = {"t": [f"c{i}" for i in range(40)]}
        results = {"ground_truth": {"t": [0]}, "predictions": {"t": [0]}}
        log_confusion_matrices(exp, ["t"], classes, 0, results, "validation", show_all=False)
        assert exp.confusion[0]["max_categories"] == 25
        exp2 = FakeExperiment()
        log_confusion_matrices(exp2, ["t"], classes, 0, results, "validation", show_all=True)
        assert exp2.confusion[0]["max_categories"] == 40


class TestLocalExperiment:
    def test_run_dir_dedup(self, tmp_path):
        base = tmp_path / "run"
        e1 = get_local_experiment({"path": str(base)})
        e2 = get_local_experiment({"path": str(base)})
        e3 = get_local_experiment({"path": str(base)})
        assert e1.path == base
        assert e2.path.name == "run1" and e3.path.name == "run2"
        assert (e1.path / "weights").is_dir()

    def test_metrics_csv_alphabetized_tab_separated(self, tmp_path):
        import pandas as pd

        (tmp_path / "r").mkdir()
        exp = LocalExperiment(tmp_path / "r")
        exp.log_metric("zeta", 1.0, epoch=0)
        exp.log_metric("alpha", 2.0, epoch=0)
        exp.log_metric("zeta", 1.5, epoch=1)
        df = pd.read_csv(tmp_path / "r" / "metrics.csv", sep="\t")
        assert list(df.columns) == ["Epoch", "alpha", "zeta"]
        assert df["zeta"].tolist() == [1.0, 1.5]

    def test_sequence_metric_averaged(self, tmp_path):
        import pandas as pd

        (tmp_path / "r").mkdir()
        exp = LocalExperiment(tmp_path / "r")
        exp.log_metric("loss", [1.0, 2.0, 3.0], epoch=0)
        df = pd.read_csv(tmp_path / "r" / "metrics.csv", sep="\t")
        assert df["loss"][0] == 2.0


class TestImageGrid:
    def test_grid_shape(self):
        batch = np.zeros((10, 16, 16, 3), np.uint8)
        grid = make_image_grid(batch, nrow=8, padding=2)
        # 2 rows x 8 cols of 16px + padding
        assert grid.shape == (2 * 18 + 2, 8 * 18 + 2, 3)
