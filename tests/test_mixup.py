"""Mixup/CutMix: deterministic math checks + train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nkbx.train.mixup import _rand_box, build_mixup

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'



class TestMixupMath:
    def test_mixup_blend(self):
        mix = build_mixup({"alpha": 0.4})
        r = np.random.default_rng(0)
        x = jnp.asarray(r.normal(size=(4, 8, 8, 3)).astype(np.float32))
        mixed, lam, partner = mix(x, jax.random.PRNGKey(1))
        lam = float(lam)
        assert 0.0 <= lam <= 1.0
        want = lam * np.asarray(x) + (1 - lam) * np.asarray(x)[::-1]
        np.testing.assert_allclose(np.asarray(mixed), want, rtol=1e-5, atol=1e-6)

    def test_cutmix_box_and_lam(self):
        mix = build_mixup({"cutmix_alpha": 1.0})
        r = np.random.default_rng(1)
        x = jnp.asarray(r.normal(size=(4, 16, 16, 3)).astype(np.float32))
        mixed, lam, partner = mix(x, jax.random.PRNGKey(2))
        mixed, x_np = np.asarray(mixed), np.asarray(x)
        flipped = x_np[::-1]
        # every pixel is either the original or the flipped row
        from_flip = np.isclose(mixed, flipped).all(-1).all(0)
        from_orig = np.isclose(mixed, x_np).all(-1).all(0)
        assert (from_flip | from_orig).all()
        # lam equals 1 - box_area / (H*W)
        np.testing.assert_allclose(float(lam), 1.0 - from_flip.mean(), atol=1e-6)

    def test_prob_zero_is_identity(self):
        mix = build_mixup({"alpha": 0.4, "prob": 0.0})
        x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 8, 8, 3)).astype(np.float32))
        mixed, lam, partner = mix(x, jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(mixed), np.asarray(x))
        assert float(lam) == 1.0

    def test_switch_selects_both_modes(self):
        mix = build_mixup({"alpha": 0.4, "cutmix_alpha": 1.0, "switch_prob": 0.5})
        x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 8, 8, 3)).astype(np.float32))
        kinds = set()
        for i in range(12):
            mixed, lam, partner = mix(x, jax.random.PRNGKey(i))
            m, xn = np.asarray(mixed), np.asarray(x)
            binary = np.logical_or(np.isclose(m, xn), np.isclose(m, xn[::-1])).all()
            kinds.add("cutmix" if binary and float(lam) not in (0.0, 1.0) else "mixup")
        assert kinds == {"cutmix", "mixup"}

    def test_bad_config_raises(self):
        with pytest.raises(ValueError, match="alpha"):
            build_mixup({})

    def test_rand_box_within_bounds(self):
        for seed in range(5):
            box, lam = _rand_box(jax.random.PRNGKey(seed), 14, 14, jnp.asarray(0.3))
            assert 0.0 <= float(lam) <= 1.0
            assert box.shape == (14, 14)


class TestMixupTrainStep:
    def _setup(self, mixup, grad_accum=1):
        from nkbx.models import get_model
        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
            classes=["a", "b", "c"], input_size=(16, 16), seed=0, dtype=jnp.float32,
        )
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        step = build_train_step(model, criterion, bundle, mixup=mixup,
                                grad_accum_steps=grad_accum)
        state = TrainState.create(model.params, model.batch_stats, bundle.tx)
        return step, state

    def test_step_runs_and_loss_finite(self):
        step, state = self._setup({"alpha": 0.4, "cutmix_alpha": 1.0})
        r = np.random.default_rng(4)
        img = jnp.asarray(r.integers(0, 255, (8, 16, 16, 3)).astype(np.uint8))
        lab = jnp.asarray(r.integers(0, 3, (8,)).astype(np.int64))
        one = jnp.asarray(1.0)
        for i in range(3):
            state, m = step(state, img, lab, jnp.ones(8, bool),
                            jax.random.PRNGKey(0), one, one)
            assert np.isfinite(float(m["loss"]))

    def test_with_grad_accum(self):
        step, state = self._setup({"alpha": 0.4}, grad_accum=2)
        r = np.random.default_rng(5)
        img = jnp.asarray(r.integers(0, 255, (8, 16, 16, 3)).astype(np.uint8))
        lab = jnp.asarray(r.integers(0, 3, (8,)).astype(np.int64))
        one = jnp.asarray(1.0)
        state, m = step(state, img, lab, jnp.ones(8, bool),
                        jax.random.PRNGKey(0), one, one)
        assert np.asarray(m["loss"]).shape == (2,)
        assert np.isfinite(np.asarray(m["loss"])).all()


class TestMixupPaddedRows:
    def test_partner_falls_back_to_self(self):
        mix = build_mixup({"alpha": 0.4})
        r = np.random.default_rng(6)
        x = jnp.asarray(r.normal(size=(4, 8, 8, 3)).astype(np.float32))
        mask = jnp.asarray([True, True, True, False])  # last row is padding
        mixed, lam, partner = mix(x, jax.random.PRNGKey(7), mask)
        p = np.asarray(partner)
        # row 0's reverse partner (row 3) is padded -> pairs with itself
        assert p[0] == 0
        # rows 1 and 2 pair normally (reverse is valid)
        assert p[1] == 2 and p[2] == 1
        # self-paired row is exactly unmixed regardless of lam
        np.testing.assert_allclose(np.asarray(mixed)[0], np.asarray(x)[0],
                                   rtol=1e-5, atol=1e-6)

    def test_guard_mixup_accum_weighted_mass(self):
        import types

        from flax import linen as nn

        from nkbx.train import build_train_step, get_loss, get_optimizer

        class NoBN(nn.Module):
            @nn.compact
            def __call__(self, x, train=False, mask=None):
                return nn.Dense(3)(jnp.mean(x.astype(jnp.float32), axis=(1, 2)))

        module = NoBN()
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        model = types.SimpleNamespace(module=module, params=variables["params"],
                                      batch_stats={})
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss",
                              "weight": [1.0, 2.0, 3.0]})
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        with pytest.raises(ValueError, match="mass-normalized"):
            build_train_step(model, criterion, bundle,
                             mixup={"alpha": 0.4}, grad_accum_steps=2)
