"""EpochCollector semantics: mask filtering, multi-task aggregation, grad logs
(the BaseLogger.get_epoch_results contract, reference logging.py:218-294)."""

import jax.numpy as jnp
import numpy as np

from nkbx.train.engine import EpochCollector, _iter_metrics


def _single_batch(bsz=4, c=3, seed=0, n_valid=None):
    r = np.random.default_rng(seed)
    preds = jnp.asarray(r.normal(size=(bsz, c)).astype(np.float32))
    labels = jnp.asarray(r.integers(0, c, bsz).astype(np.int64))
    mask = np.zeros(bsz, bool)
    mask[: (n_valid if n_valid is not None else bsz)] = True
    return _iter_metrics(preds, labels, jnp.asarray(mask), jnp.asarray(0.5)), labels, mask


class TestEpochCollector:
    def test_single_task_accumulation(self):
        col = EpochCollector("single")
        m1, l1, _ = _single_batch(seed=1)
        m2, l2, _ = _single_batch(seed=2)
        col.log_iter(m1)
        col.log_iter(m2)
        res = col.get_epoch_results()
        assert res["running_loss"] == [0.5, 0.5]
        assert len(res["ground_truth"]) == 8
        assert res["ground_truth"][:4] == list(np.asarray(l1))
        assert np.asarray(res["confidences"]).shape == (8, 3)
        # confidences are softmax rows
        np.testing.assert_allclose(np.asarray(res["confidences"]).sum(1), 1.0, rtol=1e-5)

    def test_mask_filters_padded_rows(self):
        col = EpochCollector("single")
        m, labels, mask = _single_batch(bsz=6, n_valid=4)
        col.log_iter(m)
        res = col.get_epoch_results()
        assert len(res["ground_truth"]) == 4
        assert res["ground_truth"] == list(np.asarray(labels)[:4])

    def test_multi_task_structure(self):
        col = EpochCollector("multi")
        r = np.random.default_rng(0)
        preds = {"a": jnp.asarray(r.normal(size=(4, 3)).astype(np.float32)),
                 "b": jnp.asarray(r.normal(size=(4, 2)).astype(np.float32))}
        labels = {"a": jnp.asarray(r.integers(0, 3, 4).astype(np.int64)),
                  "b": jnp.asarray(r.integers(0, 2, 4).astype(np.int64))}
        loss_out = {"a": jnp.asarray(0.2), "b": jnp.asarray(0.3), "loss": jnp.asarray(0.5)}
        m = _iter_metrics(preds, labels, jnp.ones(4, bool), loss_out)
        col.log_iter(m)
        res = col.get_epoch_results()
        assert res["running_loss"]["a"] == [np.float32(0.2)]
        assert res["running_loss"]["loss"] == [np.float32(0.5)]
        assert len(res["ground_truth"]["b"]) == 4
        assert np.asarray(res["confidences"]["a"]).shape == (4, 3)

    def test_grad_norms_aggregated(self):
        col = EpochCollector("single")
        for i in range(2):
            m, _, _ = _single_batch(seed=i)
            m["grad_norms"] = {"backbone/k": jnp.asarray(1.0 + i), "head/k": jnp.asarray(0.5)}
            col.log_iter(m)
        res = col.get_epoch_results()
        gl = res["metrics_grad_log"]
        assert gl["Gradients/backbone/k"] == [1.0, 2.0]
        assert gl["Gradients/Total"] == [1.5, 2.5]

    def test_images_kept_once(self):
        col = EpochCollector("single")
        col.log_images_if_needed(np.zeros((2, 4, 4, 3), np.uint8))
        col.log_images_if_needed(np.ones((2, 4, 4, 3), np.uint8))
        res_imgs = col.epoch_images_example
        assert (res_imgs == 0).all()  # first batch wins (logging.py:283-285)
