"""Metric semantics: identical to reference metrics.py (sklearn on accumulated
per-sample values, NaN for GT-absent classes)."""

import numpy as np
import pytest

from nkbx.metrics import compute_metrics, compute_targetwise_metrics
from nkbx.utils.config import Config


def _results(n=60, c=3, seed=0):
    r = np.random.default_rng(seed)
    conf = r.dirichlet(np.ones(c), size=n)
    gt = r.integers(0, c, size=n).tolist()
    pred = conf.argmax(1).tolist()
    return {
        "running_loss": [0.5, 0.4, 0.3],
        "confidences": conf.tolist(),
        "predictions": pred,
        "ground_truth": gt,
    }


class TestTargetwise:
    def test_matches_sklearn_direct(self):
        from sklearn.metrics import balanced_accuracy_score, roc_auc_score
        from sklearn.preprocessing import label_binarize

        res = _results()
        m = compute_targetwise_metrics(res)
        assert m["epoch_acc"] == balanced_accuracy_score(res["ground_truth"], res["predictions"])
        conf = np.array(res["confidences"])
        gt_bin = label_binarize(res["ground_truth"], classes=range(3))
        for k in range(3):
            assert m["epoch_roc_auc"][k] == roc_auc_score(gt_bin[:, k], conf[:, k])
        assert m["epoch_loss"] == np.mean([0.5, 0.4, 0.3])

    def test_absent_class_nan(self):
        res = _results(c=4)
        res["ground_truth"] = [g if g != 3 else 0 for g in res["ground_truth"]]
        with pytest.warns(UserWarning):
            m = compute_targetwise_metrics(res)
        assert np.isnan(m["epoch_roc_auc"][3])
        assert not np.isnan(m["epoch_roc_auc"][0])

    def test_binary_uses_positive_column(self):
        from sklearn.metrics import roc_auc_score

        res = _results(c=2, seed=1)
        m = compute_targetwise_metrics(res)
        conf = np.array(res["confidences"])
        assert m["epoch_roc_auc"] == roc_auc_score(res["ground_truth"], conf[:, 1])

    def test_binary_single_class_nan(self):
        res = _results(c=2)
        res["ground_truth"] = [0] * len(res["ground_truth"])
        with pytest.warns(UserWarning):
            m = compute_targetwise_metrics(res)
        assert np.isnan(m["epoch_roc_auc"])


class TestComputeMetrics:
    def test_single(self):
        cfg = Config({"task": "single"})
        m = compute_metrics(cfg, _results())
        assert "epoch_acc" in m and m["loss"] == [0.5, 0.4, 0.3]

    def test_multi_mean_acc(self):
        cfg = Config({"task": "multi", "target_names": ["a", "b"]})
        res = {
            "running_loss": {"a": [0.1], "b": [0.2], "loss": [0.3]},
            "confidences": {"a": _results(seed=1)["confidences"], "b": _results(seed=2)["confidences"]},
            "predictions": {"a": _results(seed=1)["predictions"], "b": _results(seed=2)["predictions"]},
            "ground_truth": {"a": _results(seed=1)["ground_truth"], "b": _results(seed=2)["ground_truth"]},
        }
        m = compute_metrics(cfg, res)
        assert m["epoch_acc"] == np.mean([m["a"]["epoch_acc"], m["b"]["epoch_acc"]])
        assert m["loss"] == [0.3]

    def test_unknown_task_raises(self):
        with pytest.raises(ValueError):
            compute_metrics(Config({"task": "triple"}), _results())
