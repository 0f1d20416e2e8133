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


class TestBitCompatVsReference:
    """Run the REFERENCE's own metrics.py (pure numpy+sklearn, imported from
    /root/reference) against nkbx.metrics on identical inputs — the
    BASELINE.json bit-compatibility requirement, tested literally."""

    @pytest.fixture(scope="class")
    def reference_metrics(self):
        import sys

        ref_root = "/root/reference"
        if ref_root not in sys.path:
            sys.path.insert(0, ref_root)
        try:
            from nkb_classification import metrics as ref_metrics
        except ImportError:
            pytest.skip("reference repo not mounted")
        return ref_metrics

    @pytest.mark.parametrize("seed,c", [(0, 3), (1, 2), (2, 5), (3, 7)])
    def test_single_task_identical(self, reference_metrics, seed, c):
        res = _results(n=80, c=c, seed=seed)
        ours = compute_targetwise_metrics(res)
        import warnings as W

        with W.catch_warnings():
            W.simplefilter("ignore")
            theirs = reference_metrics.compute_targetwise_metrics(res)
        assert ours["epoch_acc"] == theirs["epoch_acc"]
        np.testing.assert_array_equal(
            np.asarray(ours["epoch_roc_auc"], dtype=float),
            np.asarray(theirs["epoch_roc_auc"], dtype=float))
        assert ours["epoch_loss"] == theirs["epoch_loss"]

    def test_absent_class_nan_identical(self, reference_metrics):
        res = _results(n=60, c=4, seed=5)
        res["ground_truth"] = [g if g != 3 else 0 for g in res["ground_truth"]]
        import warnings as W

        with W.catch_warnings():
            W.simplefilter("ignore")
            ours = compute_targetwise_metrics(dict(res))
            theirs = reference_metrics.compute_targetwise_metrics(dict(res))
        np.testing.assert_array_equal(
            np.isnan(np.asarray(ours["epoch_roc_auc"], float)),
            np.isnan(np.asarray(theirs["epoch_roc_auc"], float)))
        a, b = np.asarray(ours["epoch_roc_auc"], float), np.asarray(theirs["epoch_roc_auc"], float)
        np.testing.assert_array_equal(a[~np.isnan(a)], b[~np.isnan(b)])

    def test_multi_task_identical(self, reference_metrics):
        from types import SimpleNamespace

        res = {
            "running_loss": {"a": [0.1, 0.2], "b": [0.3], "loss": [0.4, 0.5]},
            "confidences": {"a": _results(seed=6)["confidences"], "b": _results(seed=7, c=2)["confidences"]},
            "predictions": {"a": _results(seed=6)["predictions"], "b": _results(seed=7, c=2)["predictions"]},
            "ground_truth": {"a": _results(seed=6)["ground_truth"], "b": _results(seed=7, c=2)["ground_truth"]},
        }
        cfg = SimpleNamespace(task="multi", target_names=["a", "b"])
        ours = compute_metrics(cfg, res)
        theirs = reference_metrics.compute_metrics(cfg, res)
        assert ours["epoch_acc"] == theirs["epoch_acc"]
        assert ours["a"]["epoch_acc"] == theirs["a"]["epoch_acc"]
        np.testing.assert_array_equal(
            np.asarray(ours["a"]["epoch_roc_auc"], float),
            np.asarray(theirs["a"]["epoch_roc_auc"], float))
        assert ours["loss"] == theirs["loss"]
