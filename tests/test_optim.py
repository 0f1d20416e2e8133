"""Optimizer-step parity vs torch: the two-group update pipeline
(grads -> direction -> lr/schedule/freeze scaling) must reproduce
torch.optim semantics (reference utils.py:10-42)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from nkbx.train.optim import (
    apply_coupled_wd,
    backbone_state_factor,
    get_optimizer,
    get_scheduler,
    mask_frozen_grads,
    scale_updates,
)


def _fake_params(seed=0):
    """Param tree shaped like a classifier: backbone + head leaves."""
    r = np.random.default_rng(seed)
    return {
        "backbone": {"Conv_0": {"kernel": jnp.asarray(r.normal(size=(3, 3, 4, 8)).astype(np.float32))}},
        "head": {"kernel": jnp.asarray(r.normal(size=(8, 2)).astype(np.float32)),
                 "bias": jnp.asarray(r.normal(size=2).astype(np.float32))},
    }


def _fake_grads(seed=1):
    r = np.random.default_rng(seed)
    return {
        "backbone": {"Conv_0": {"kernel": jnp.asarray(r.normal(size=(3, 3, 4, 8)).astype(np.float32))}},
        "head": {"kernel": jnp.asarray(r.normal(size=(8, 2)).astype(np.float32)),
                 "bias": jnp.asarray(r.normal(size=2).astype(np.float32))},
    }


def _torch_steps(opt_ctor, params_np, grads_np, n_steps, **kw):
    t_params = [torch.nn.Parameter(torch.tensor(p)) for p in params_np]
    opt = opt_ctor(t_params, **kw)
    for _ in range(n_steps):
        opt.zero_grad()
        for p, g in zip(t_params, grads_np):
            p.grad = torch.tensor(g)
        opt.step()
    return [p.detach().numpy() for p in t_params]


def _nkbx_steps(cfg, params, grads, n_steps, lr_factor=1.0, freeze_scale=1.0):
    bundle = get_optimizer(params, cfg)
    opt_state = bundle.tx.init(params)
    for _ in range(n_steps):
        g = apply_coupled_wd(grads, params, bundle.coupled_wds)
        g = mask_frozen_grads(g, freeze_scale)
        updates, opt_state = bundle.tx.update(g, opt_state, params)
        updates = scale_updates(updates, params, bundle.lrs,
                                jnp.asarray(lr_factor), jnp.asarray(freeze_scale))
        params = optax.apply_updates(params, updates)
    return params


class TestOptimizerParity:
    @pytest.mark.parametrize("n_steps", [1, 5])
    def test_adam_coupled_wd(self, n_steps):
        params, grads = _fake_params(), _fake_grads()
        flat = jax.tree_util.tree_leaves(params)
        gflat = jax.tree_util.tree_leaves(grads)
        ref = _torch_steps(torch.optim.Adam, [np.asarray(p) for p in flat],
                           [np.asarray(g) for g in gflat], n_steps,
                           lr=1e-2, weight_decay=0.1)
        out = _nkbx_steps({"type": "adam", "lr": 1e-2, "weight_decay": 0.1},
                          params, grads, n_steps)
        for a, b in zip(jax.tree_util.tree_leaves(out), ref):
            np.testing.assert_allclose(np.asarray(a), b, rtol=2e-5, atol=1e-6)

    @pytest.mark.parametrize("wd,n_steps", [(0.0, 1), (0.0, 7), (0.05, 7)])
    def test_nadam_matches_torch(self, wd, n_steps):
        """torch.optim.NAdam lockstep incl. the annealed momentum schedule
        (mu_t = b1*(1-0.5*0.96^(t*psi))) and decoupled weight decay — the
        reference's optimizer (utils.py:35). optax's nesterov-adam lacks the
        schedule; nkbx ships a torch-exact transform (scale_by_torch_nadam)."""
        params, grads = _fake_params(), _fake_grads()
        flat = [np.asarray(p) for p in jax.tree_util.tree_leaves(params)]
        gflat = [np.asarray(g) for g in jax.tree_util.tree_leaves(grads)]
        ref = _torch_steps(torch.optim.NAdam, flat, gflat, n_steps,
                           lr=1e-2, weight_decay=wd,
                           decoupled_weight_decay=True)
        out = _nkbx_steps({"type": "nadam", "lr": 1e-2, "weight_decay": wd},
                          params, grads, n_steps)
        for a, b in zip(jax.tree_util.tree_leaves(out), ref):
            np.testing.assert_allclose(np.asarray(a), b, rtol=2e-5, atol=1e-6)

    def test_sgd(self):
        params, grads = _fake_params(), _fake_grads()
        ref = _torch_steps(torch.optim.SGD,
                           [np.asarray(p) for p in jax.tree_util.tree_leaves(params)],
                           [np.asarray(g) for g in jax.tree_util.tree_leaves(grads)],
                           3, lr=0.05, weight_decay=0.01)
        out = _nkbx_steps({"type": "sgd", "lr": 0.05, "weight_decay": 0.01}, params, grads, 3)
        for a, b in zip(jax.tree_util.tree_leaves(out), ref):
            np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5, atol=1e-7)

    def test_two_group_lrs(self):
        """Backbone and head move with their own lrs (reference utils.py:11-28)."""
        params, grads = _fake_params(), _fake_grads()
        out = _nkbx_steps({"type": "sgd", "lr": 1.0, "backbone_lr": 0.0,
                           "classifier_lr": 0.5}, params, grads, 1)
        np.testing.assert_allclose(
            np.asarray(out["backbone"]["Conv_0"]["kernel"]),
            np.asarray(params["backbone"]["Conv_0"]["kernel"]))  # lr 0: unchanged
        expect = np.asarray(params["head"]["bias"]) - 0.5 * np.asarray(grads["head"]["bias"])
        np.testing.assert_allclose(np.asarray(out["head"]["bias"]), expect, rtol=1e-6)

    def test_freeze_blocks_backbone_only(self):
        params, grads = _fake_params(), _fake_grads()
        out = _nkbx_steps({"type": "adam", "lr": 1e-2}, params, grads, 2, freeze_scale=0.0)
        np.testing.assert_allclose(
            np.asarray(out["backbone"]["Conv_0"]["kernel"]),
            np.asarray(params["backbone"]["Conv_0"]["kernel"]))
        assert not np.allclose(np.asarray(out["head"]["kernel"]),
                               np.asarray(params["head"]["kernel"]))

    def test_frozen_coupled_wd_leaves_moments_zero(self):
        """During a freeze, coupled wd must NOT leak into Adam moments
        (otherwise unfreeze starts with full-magnitude sign(p) decay steps)."""
        params, grads = _fake_params(), _fake_grads()
        bundle = get_optimizer(params, {"type": "adam", "lr": 1e-2, "weight_decay": 0.1})
        opt_state = bundle.tx.init(params)
        for _ in range(3):
            g = apply_coupled_wd(grads, params, bundle.coupled_wds)
            g = mask_frozen_grads(g, 0.0)
            updates, opt_state = bundle.tx.update(g, opt_state, params)
            updates = scale_updates(updates, params, bundle.lrs,
                                    jnp.asarray(1.0), jnp.asarray(0.0))
            params = optax.apply_updates(params, updates)
        adam_state = opt_state.inner_states["backbone"].inner_state
        mu = jax.tree_util.tree_leaves(adam_state.mu["backbone"])
        assert mu and all(float(np.abs(np.asarray(m)).max()) == 0.0 for m in mu)

    def test_unknown_type_raises(self):
        with pytest.raises(NotImplementedError):
            get_optimizer(_fake_params(), {"type": "lion"})

    def test_torch_freeze_keeps_moments_stale(self):
        """freeze_semantics="torch" (select_frozen_opt_state): frozen backbone
        moments AND step count keep their pre-freeze values exactly — torch
        skips requires_grad=False params; the default semantics decay mu by
        beta1 per frozen step instead. Both leave the params untouched."""
        from nkbx.train.optim import select_frozen_opt_state

        params, grads = _fake_params(), _fake_grads()
        bundle = get_optimizer(params, {"type": "adam", "lr": 1e-2})
        opt_state = bundle.tx.init(params)
        # 2 warm-up steps build nonzero moments
        for _ in range(2):
            g = mask_frozen_grads(grads, 1.0)
            updates, opt_state = bundle.tx.update(g, opt_state, params)
            params = optax.apply_updates(
                params, scale_updates(updates, params, bundle.lrs,
                                      jnp.asarray(1.0), jnp.asarray(1.0)))

        def backbone_adam(s):
            a = s.inner_states["backbone"].inner_state
            return (np.asarray(a.count),
                    np.asarray(a.mu["backbone"]["Conv_0"]["kernel"]),
                    np.asarray(a.nu["backbone"]["Conv_0"]["kernel"]))

        count0, mu0, nu0 = backbone_adam(opt_state)
        assert count0 == 2 and np.abs(mu0).max() > 0

        # 3 frozen steps under BOTH semantics from the same snapshot
        for semantics in ("torch", "decay"):
            st, ps = opt_state, params
            for _ in range(3):
                g = mask_frozen_grads(grads, 0.0)
                updates, new_st = bundle.tx.update(g, st, ps)
                if semantics == "torch":
                    new_st = select_frozen_opt_state(new_st, st, jnp.asarray(0.0))
                st = new_st
                ps = optax.apply_updates(
                    ps, scale_updates(updates, ps, bundle.lrs,
                                      jnp.asarray(1.0), jnp.asarray(0.0)))
            np.testing.assert_array_equal(
                np.asarray(ps["backbone"]["Conv_0"]["kernel"]),
                np.asarray(params["backbone"]["Conv_0"]["kernel"]))
            count, mu, nu = backbone_adam(st)
            if semantics == "torch":
                assert count == 2  # step count stops, like torch's per-param step
                np.testing.assert_array_equal(mu, mu0)
                np.testing.assert_array_equal(nu, nu0)
                # classifier group is untouched by the selection: it advanced
                cl = st.inner_states["classifier"].inner_state
                assert np.asarray(cl.count) == 5
            else:
                assert count == 5
                np.testing.assert_allclose(mu, mu0 * 0.9 ** 3, rtol=1e-6)
                np.testing.assert_allclose(nu, nu0 * 0.999 ** 3, rtol=1e-6)


class TestSchedules:
    def test_step(self):
        f = get_scheduler({"type": "step", "step_size": 2, "gamma": 0.1})
        assert [f(e) for e in range(5)] == pytest.approx([1, 1, 0.1, 0.1, 0.01])

    def test_multistep(self):
        f = get_scheduler({"type": "multistep", "steps": [2, 4], "gamma": 0.5})
        assert [f(e) for e in range(5)] == pytest.approx([1, 1, 0.5, 0.5, 0.25])

    def test_cosine_matches_torch(self):
        t_params = [torch.nn.Parameter(torch.zeros(1))]
        opt = torch.optim.SGD(t_params, lr=1.0)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=10)
        f = get_scheduler({"type": "cosine", "n_epochs": 10})
        for e in range(10):
            assert f(e) == pytest.approx(opt.param_groups[0]["lr"], abs=1e-6), e
            sched.step()

    def test_empty_policy_constant(self):
        f = get_scheduler({})
        assert f(0) == f(100) == 1.0

    def test_backbone_state_factor(self):
        policy = {0: "freeze", 5: "unfreeze", 10: "freeze"}
        assert backbone_state_factor(policy, 0) == 0.0
        assert backbone_state_factor(policy, 3) == 0.0
        assert backbone_state_factor(policy, 5) == 1.0
        assert backbone_state_factor(policy, 7) == 1.0
        assert backbone_state_factor(policy, 12) == 0.0
        # no entry <= epoch: keep previous
        assert backbone_state_factor({3: "freeze"}, 1, prev=1.0) == 1.0
