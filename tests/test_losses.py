"""Loss parity vs torch (reference uses torch CE / a torch FocalLoss,
losses.py:10-176)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from nkbx.train import MultitaskCriterion, cross_entropy, focal_loss, get_loss


def _logits_labels(n=16, c=5, seed=0):
    r = np.random.default_rng(seed)
    logits = r.normal(size=(n, c)).astype(np.float32)
    labels = r.integers(0, c, size=n).astype(np.int64)
    return logits, labels


class TestCrossEntropy:
    def test_matches_torch(self):
        logits, labels = _logits_labels()
        ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
        ref = F.cross_entropy(torch.tensor(logits), torch.tensor(labels))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    def test_weighted_matches_torch(self):
        logits, labels = _logits_labels(c=4)
        w = np.array([0.2, 1.0, 2.0, 0.5], dtype=np.float32)
        ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels), weight=w)
        ref = F.cross_entropy(torch.tensor(logits), torch.tensor(labels), weight=torch.tensor(w))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    def test_mask_equals_subset(self):
        logits, labels = _logits_labels(n=10)
        mask = np.array([True] * 7 + [False] * 3)
        ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels), mask=jnp.asarray(mask))
        ref = F.cross_entropy(torch.tensor(logits[:7]), torch.tensor(labels[:7]))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


class _TorchFocal(torch.nn.Module):
    """Reference focal loss math (losses.py:59-94) re-expressed for the test."""

    def __init__(self, alpha=None, gamma=2.0, ignore_index=-100):
        super().__init__()
        self.gamma = gamma
        self.ignore_index = ignore_index
        self.nll = torch.nn.NLLLoss(weight=alpha, reduction="none", ignore_index=ignore_index)

    def forward(self, x, y):
        mask = y != self.ignore_index
        y = y[mask]
        if len(y) == 0:
            return torch.tensor(0.0)
        x = x[mask]
        log_p = x.log_softmax(dim=-1)
        ce = self.nll(log_p, y)
        log_pt = log_p[torch.arange(len(x)), y]
        focal = (1 - log_pt.exp()) ** self.gamma
        return (focal * ce).mean()


class TestFocalLoss:
    def test_matches_reference_math(self):
        logits, labels = _logits_labels()
        ours = focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0)
        ref = _TorchFocal(gamma=2.0)(torch.tensor(logits), torch.tensor(labels))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    def test_alpha_and_gamma(self):
        logits, labels = _logits_labels(c=3, seed=1)
        alpha = np.array([0.25, 0.5, 1.0], dtype=np.float32)
        ours = focal_loss(jnp.asarray(logits), jnp.asarray(labels), alpha=alpha, gamma=1.5)
        ref = _TorchFocal(alpha=torch.tensor(alpha), gamma=1.5)(torch.tensor(logits), torch.tensor(labels))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    def test_ignore_index(self):
        logits, labels = _logits_labels(n=12)
        labels[::3] = -100
        ours = focal_loss(jnp.asarray(logits), jnp.asarray(labels))
        ref = _TorchFocal()(torch.tensor(logits), torch.tensor(labels))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    def test_all_ignored_returns_zero(self):
        logits, labels = _logits_labels(n=4)
        labels[:] = -100
        assert float(focal_loss(jnp.asarray(logits), jnp.asarray(labels))) == 0.0


class TestMultitask:
    def test_per_target_plus_sum(self):
        crit = get_loss({"task": "multi", "type": "CrossEntropyLoss"})
        assert isinstance(crit, MultitaskCriterion)
        la, lb = _logits_labels(c=3, seed=2), _logits_labels(c=2, seed=3)
        pred = {"a": jnp.asarray(la[0]), "b": jnp.asarray(lb[0])}
        true = {"a": jnp.asarray(la[1]), "b": jnp.asarray(lb[1])}
        out = crit(pred, true)
        assert set(out) == {"a", "b", "loss"}
        np.testing.assert_allclose(float(out["loss"]), float(out["a"]) + float(out["b"]), rtol=1e-6)

    def test_get_loss_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            get_loss({"task": "single", "type": "HingeLoss"})


class TestBitCompatVsReferenceFocal:
    """Run the REFERENCE's own FocalLoss (losses.py, imported from
    /root/reference — torch is available) against nkbx focal_loss."""

    @pytest.fixture(scope="class")
    def ref_losses(self):
        import sys

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        try:
            from nkb_classification import losses as ref_losses
        except ImportError:
            pytest.skip("reference repo not mounted")
        return ref_losses

    @pytest.mark.parametrize("seed,c,gamma", [(0, 5, 2.0), (1, 3, 1.5), (2, 2, 0.0)])
    def test_focal_identical(self, ref_losses, seed, c, gamma):
        logits, labels = _logits_labels(n=24, c=c, seed=seed)
        theirs = ref_losses.FocalLoss(gamma=gamma)(torch.tensor(logits), torch.tensor(labels))
        ours = focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=gamma)
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)

    def test_focal_alpha_ignore_identical(self, ref_losses):
        logits, labels = _logits_labels(n=20, c=4, seed=3)
        labels[::4] = -100
        alpha = np.array([0.1, 0.4, 0.2, 0.3], dtype=np.float32)
        theirs = ref_losses.FocalLoss(alpha=torch.tensor(alpha), gamma=2.0)(
            torch.tensor(logits), torch.tensor(labels))
        ours = focal_loss(jnp.asarray(logits), jnp.asarray(labels), alpha=alpha, gamma=2.0)
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)


class TestLabelSmoothing:
    def test_matches_torch_cross_entropy(self):
        import torch
        import torch.nn.functional as F

        from nkbx.train.losses import cross_entropy

        rng = np.random.default_rng(20)
        logits = rng.normal(size=(10, 5)).astype(np.float32)
        labels = rng.integers(0, 5, 10).astype(np.int64)
        for eps in (0.0, 0.1, 0.3):
            want = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                                         label_smoothing=eps))
            got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                      label_smoothing=eps))
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_matches_torch_with_class_weights(self):
        import torch
        import torch.nn.functional as F

        from nkbx.train.losses import cross_entropy

        rng = np.random.default_rng(21)
        logits = rng.normal(size=(10, 3)).astype(np.float32)
        labels = rng.integers(0, 3, 10).astype(np.int64)
        w = np.array([1.0, 2.5, 0.5], np.float32)
        want = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                                     weight=torch.tensor(w), label_smoothing=0.2))
        got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                  weight=w, label_smoothing=0.2))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_config_key(self):
        from nkbx.train import get_loss

        crit = get_loss({"task": "single", "type": "CrossEntropyLoss",
                         "label_smoothing": 0.1})
        rng = np.random.default_rng(22)
        logits = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 3, 4).astype(np.int64))
        plain = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        assert float(crit(logits, labels)) != float(plain(logits, labels))
