"""Bounded device-side metric accumulation (SURVEY.md §5.5, VERDICT r1 #4).

Done-criterion: an epoch holds O(C^2) state instead of O(N*C) per-sample
buffers, and the finalized metrics equal the exact sklearn path (balanced
accuracy exactly; ROC-AUC within the documented 1/N_BINS quantization
tolerance — exactly when the scores sit on the bin grid).
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from nkbx.metrics import (
    N_BINS,
    bounded_targetwise_metrics,
    bounded_update,
    compute_metrics,
    compute_targetwise_metrics,
    make_bounded_state,
)
from nkbx.train.engine import EpochCollector, _iter_metrics


def _fold_all(conf, pred, gt, mask, losses, batch=16):
    state = make_bounded_state(conf.shape[1])
    for i in range(0, len(gt), batch):
        s = slice(i, i + batch)
        state = bounded_update(state, jnp.asarray(conf[s]), jnp.asarray(pred[s]),
                               jnp.asarray(gt[s]), jnp.asarray(mask[s]),
                               jnp.asarray(losses[i // batch]))
    return state


def _random_epoch(rng, n=128, c=5, absent=()):
    conf = rng.random((n, c)).astype(np.float32)
    conf /= conf.sum(1, keepdims=True)
    gt = rng.integers(0, c, n).astype(np.int64)
    for a in absent:
        gt[gt == a] = (a + 1) % c
    pred = conf.argmax(1).astype(np.int64)
    mask = np.ones(n, bool)
    mask[-3:] = False
    return conf, pred, gt, mask


class TestBoundedMetrics:
    def test_balanced_accuracy_exact(self):
        from sklearn.metrics import balanced_accuracy_score

        rng = np.random.default_rng(0)
        conf, pred, gt, mask = _random_epoch(rng)
        losses = np.arange(8, dtype=np.float32)
        state = _fold_all(conf, pred, gt, mask, losses)
        out = bounded_targetwise_metrics(state)
        want = balanced_accuracy_score(gt[mask], pred[mask])
        np.testing.assert_allclose(out["epoch_acc"], want, rtol=1e-12)
        np.testing.assert_allclose(out["epoch_loss"], losses.mean(), rtol=1e-6)

    def test_roc_auc_close_to_sklearn(self):
        rng = np.random.default_rng(1)
        conf, pred, gt, mask = _random_epoch(rng, n=256, c=4)
        state = _fold_all(conf, pred, gt, mask, np.zeros(16, np.float32))
        out = bounded_targetwise_metrics(state)
        exact = compute_targetwise_metrics({
            "confidences": conf[mask].tolist(),
            "predictions": pred[mask].tolist(),
            "ground_truth": gt[mask].tolist(),
            "running_loss": [0.0],
        })
        np.testing.assert_allclose(out["epoch_roc_auc"], exact["epoch_roc_auc"],
                                   atol=2.0 / N_BINS * 10)

    def test_roc_auc_exact_on_bin_grid(self):
        """Scores quantized to bin centers -> identical to sklearn."""
        rng = np.random.default_rng(2)
        conf, pred, gt, mask = _random_epoch(rng, n=200, c=3)
        conf = (np.floor(conf * N_BINS) + 0.5) / N_BINS  # bin centers
        state = _fold_all(conf.astype(np.float32), pred, gt, mask, np.zeros(13, np.float32))
        out = bounded_targetwise_metrics(state)
        exact = compute_targetwise_metrics({
            "confidences": conf[mask].tolist(),
            "predictions": pred[mask].tolist(),
            "ground_truth": gt[mask].tolist(),
            "running_loss": [0.0],
        })
        np.testing.assert_allclose(out["epoch_roc_auc"], exact["epoch_roc_auc"],
                                   rtol=1e-9)

    def test_absent_class_nan_and_warning(self):
        rng = np.random.default_rng(3)
        conf, pred, gt, mask = _random_epoch(rng, c=5, absent=(2,))
        state = _fold_all(conf, pred, gt, mask, np.zeros(8, np.float32))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = bounded_targetwise_metrics(state)
        assert any("Number of classes in ground truth" in str(x.message) for x in w)
        assert np.isnan(out["epoch_roc_auc"][2])
        assert not np.isnan(np.delete(out["epoch_roc_auc"], 2)).any()

    def test_binary_task(self):
        from sklearn.metrics import roc_auc_score

        rng = np.random.default_rng(4)
        conf, pred, gt, mask = _random_epoch(rng, c=2)
        conf = (np.floor(conf * N_BINS) + 0.5) / N_BINS
        state = _fold_all(conf.astype(np.float32), pred, gt, mask, np.zeros(8, np.float32))
        out = bounded_targetwise_metrics(state)
        want = roc_auc_score(gt[mask], conf[mask][:, 1])
        np.testing.assert_allclose(out["epoch_roc_auc"], want, rtol=1e-9)


class TestBoundedCollector:
    def _epoch_batches(self, rng, n_batches=4, bsz=8, c=3):
        batches = []
        for i in range(n_batches):
            preds = jnp.asarray(rng.normal(size=(bsz, c)).astype(np.float32))
            labels = jnp.asarray(rng.integers(0, c, bsz).astype(np.int64))
            mask = np.ones(bsz, bool)
            if i == n_batches - 1:
                mask[-2:] = False
            batches.append(_iter_metrics(preds, labels, jnp.asarray(mask),
                                         jnp.asarray(0.1 * (i + 1))))
        return batches

    def test_matches_exact_collector(self):
        rng = np.random.default_rng(5)
        batches = self._epoch_batches(rng)

        exact = EpochCollector("single", "exact")
        bounded = EpochCollector("single", "bounded")
        for m in batches:
            exact.log_iter(m)
            bounded.log_iter(m)
        res_e = exact.get_epoch_results()
        res_b = bounded.get_epoch_results()

        m_e = compute_metrics({"task": "single"}, res_e)
        m_b = compute_metrics({"task": "single"}, res_b)
        np.testing.assert_allclose(m_b["epoch_acc"], m_e["epoch_acc"], rtol=1e-12)
        np.testing.assert_allclose(m_b["epoch_loss"], m_e["epoch_loss"], rtol=1e-6)
        np.testing.assert_allclose(m_b["epoch_roc_auc"], m_e["epoch_roc_auc"],
                                   atol=2e-3)
        np.testing.assert_allclose(res_b["running_loss"], res_e["running_loss"],
                                   rtol=1e-6)

    def test_memory_is_bounded(self):
        rng = np.random.default_rng(6)
        col = EpochCollector("single", "bounded")
        for m in self._epoch_batches(rng, n_batches=10):
            col.log_iter(m)
        assert col._batches == []  # no per-sample retention
        assert set(col._bounded) == {None}
        assert col._bounded[None]["counts"].shape == (3, 3)

    def test_multi_task(self):
        rng = np.random.default_rng(7)
        col = EpochCollector("multi", "bounded")
        for i in range(3):
            preds = {"a": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
                     "b": jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))}
            labels = {"a": jnp.asarray(rng.integers(0, 3, 4).astype(np.int64)),
                      "b": jnp.asarray(rng.integers(0, 2, 4).astype(np.int64))}
            loss_out = {"a": jnp.asarray(0.2), "b": jnp.asarray(0.3),
                        "loss": jnp.asarray(0.5)}
            col.log_iter(_iter_metrics(preds, labels, jnp.ones(4, bool), loss_out))
        res = col.get_epoch_results()
        out = compute_metrics({"task": "multi", "target_names": ["a", "b"]}, res)
        assert set(res["bounded_metrics"]) == {"a", "b"}
        assert res["confusion_counts"]["a"].shape == (3, 3)
        assert res["confusion_counts"]["a"].sum() == 12
        np.testing.assert_allclose(res["running_loss"]["loss"], [0.5] * 3, rtol=1e-6)
        assert 0.0 <= out["epoch_acc"] <= 1.0


class TestBoundedWithScanChunks:
    def test_stacked_chunk_equals_per_batch(self):
        rng = np.random.default_rng(8)
        k, bsz, c = 3, 8, 4
        conf = rng.random((k, bsz, c)).astype(np.float32)
        conf /= conf.sum(-1, keepdims=True)
        gt = rng.integers(0, c, (k, bsz)).astype(np.int64)
        pred = conf.argmax(-1).astype(np.int64)
        mask = np.ones((k, bsz), bool)
        mask[-1, -2:] = False
        losses = np.array([0.1, 0.2, 0.3], np.float32)

        stacked = bounded_update(make_bounded_state(c), jnp.asarray(conf),
                                 jnp.asarray(pred), jnp.asarray(gt),
                                 jnp.asarray(mask), jnp.asarray(losses))
        per = make_bounded_state(c)
        for i in range(k):
            per = bounded_update(per, jnp.asarray(conf[i]), jnp.asarray(pred[i]),
                                 jnp.asarray(gt[i]), jnp.asarray(mask[i]),
                                 jnp.asarray(losses[i]))
        for key in stacked:
            np.testing.assert_allclose(np.asarray(stacked[key]), np.asarray(per[key]),
                                       err_msg=key)

    def test_collector_bounded_scan_mode(self):
        from nkbx.train.engine import _iter_metrics

        rng = np.random.default_rng(9)
        k, bsz, c = 2, 4, 3
        preds = jnp.asarray(rng.normal(size=(k, bsz, c)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, c, (k, bsz)).astype(np.int64))
        mask = jnp.ones((k, bsz), bool)
        losses = jnp.asarray(np.array([0.4, 0.6], np.float32))
        m = _iter_metrics(preds, labels, mask, losses)

        col_b = EpochCollector("single", "bounded")
        col_b.log_iter(m)
        res = col_b.get_epoch_results()
        np.testing.assert_allclose(res["running_loss"], [0.4, 0.6], rtol=1e-6)
        np.testing.assert_allclose(res["bounded_metrics"]["epoch_loss"], 0.5, rtol=1e-6)
        assert res["confusion_counts"].sum() == k * bsz
