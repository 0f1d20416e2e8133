"""Ghost batch norm (max-throughput recipe opt-in, SEMANTICS-CHANGING).

``ghost_bn=g`` computes BN batch statistics per ghost batch of g rows (Hoffer
et al. 2017) instead of over the full batch — the reference
(engine.py:43-47 AMP autocast) has its own labeled accuracy-for-speed knob;
this is nkbx's. The ghost stats contract is what lets the fused Pallas
bottleneck-chain kernel (nkbx/ops/bottleneck.py) tile the batch with stats
local to each tile. Tests: per-group semantics vs torch BatchNorm2d applied
group-wise, running-stat aggregation, plumbing through ResNet, loud errors,
and a small exact-vs-ghost training-trajectory comparison (the accuracy
evidence at test scale).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nkbx.models.common import TorchBatchNorm


class TestGhostSemantics:
    def test_matches_torch_per_group(self):
        import torch

        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 5, 5, 3)).astype(np.float32) * 2 + 1
        mod = TorchBatchNorm(use_running_average=False, momentum=0.9, ghost_bn=2)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y, mut = mod.apply(v, jnp.asarray(x), mutable=["batch_stats"])

        outs, gms, gvs = [], [], []
        for gi in range(2):
            tbn = torch.nn.BatchNorm2d(3, momentum=1.0)
            tbn.train()
            xt = torch.tensor(np.transpose(x[2 * gi:2 * gi + 2], (0, 3, 1, 2)))
            with torch.no_grad():
                yt = tbn(xt)
            outs.append(np.transpose(yt.numpy(), (0, 2, 3, 1)))
            gms.append(tbn.running_mean.numpy())
            gvs.append(tbn.running_var.numpy())
        np.testing.assert_allclose(np.asarray(y), np.concatenate(outs, 0),
                                   atol=2e-6)
        # running stats: EMA toward the MEAN of the per-group stats
        # (unbiased var, n = g*H*W — matching torch's per-group update)
        m = 0.9
        np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                                   (1 - m) * np.mean(gms, 0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                                   m * 1.0 + (1 - m) * np.mean(gvs, 0),
                                   atol=1e-6)

    def test_eval_mode_unchanged(self):
        """Ghost only changes TRAIN-mode stats; eval uses running stats."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(4, 3, 3, 2)).astype(np.float32))
        exact = TorchBatchNorm(use_running_average=True)
        ghost = TorchBatchNorm(use_running_average=True, ghost_bn=2)
        v = exact.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(exact.apply(v, x), ghost.apply(v, x))

    def test_bad_group_and_mask_raise(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4, 3, 3, 2)).astype(np.float32))
        mod = TorchBatchNorm(ghost_bn=3)
        v = mod.init(jax.random.PRNGKey(0), x)
        with pytest.raises(ValueError, match="divide"):
            mod.apply(v, x, mutable=["batch_stats"])
        mod2 = TorchBatchNorm(ghost_bn=2)
        v2 = mod2.init(jax.random.PRNGKey(0), x)
        with pytest.raises(ValueError, match="drop_last"):
            mod2.apply(v2, x, mask=jnp.ones((4, 1, 1, 1), bool),
                       mutable=["batch_stats"])


class TestResNetPlumbing:
    def test_ghost_resnet_runs_and_differs_from_exact(self):
        from nkbx.models.resnet import ResNet, Bottleneck

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
        mk = lambda g: ResNet(stage_sizes=(2,), block_cls=Bottleneck,
                              stem_width=8, dtype=jnp.float32, ghost_bn=g)
        v = mk(0).init(jax.random.PRNGKey(0), x, train=False)
        out_exact, _ = mk(0).apply(v, x, train=True, mutable=["batch_stats"])
        out_ghost, _ = mk(2).apply(v, x, train=True, mutable=["batch_stats"])
        assert out_ghost.shape == out_exact.shape
        assert np.isfinite(np.asarray(out_ghost)).all()
        # different stats semantics -> different activations
        assert np.abs(np.asarray(out_ghost) - np.asarray(out_exact)).max() > 1e-6

    def test_fused_without_ghost_raises(self):
        from nkbx.models.resnet import ResNet, Bottleneck

        x = jnp.zeros((2, 16, 16, 3), jnp.float32)
        mod = ResNet(stage_sizes=(1,), block_cls=Bottleneck, stem_width=8,
                     fused_bottleneck=True)
        with pytest.raises(ValueError, match="ghost_bn"):
            mod.init(jax.random.PRNGKey(0), x, train=False)

    def test_fused_on_basicblock_raises(self):
        """fused_bottleneck covers Bottleneck only; silently ignoring it on a
        BasicBlock ResNet would fake any benchmark built on the flag."""
        from nkbx.models.resnet import BasicBlock, ResNet

        x = jnp.zeros((2, 16, 16, 3), jnp.float32)
        mod = ResNet(stage_sizes=(1,), block_cls=BasicBlock, stem_width=8,
                     ghost_bn=2, fused_bottleneck=True)
        with pytest.raises(ValueError, match="Bottleneck blocks only"):
            mod.init(jax.random.PRNGKey(0), x, train=False)

    def test_backbone_opts_config_surface(self):
        """model.backbone_opts threads module fields from the config dict."""
        from nkbx.models import get_model

        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": False,
             "backbone_opts": {"ghost_bn": 2}},
            classes=["a", "b"], input_size=(16, 16), dtype=jnp.float32)
        assert model.module.backbone.ghost_bn == 2
        with pytest.raises(TypeError):
            get_model(
                {"task": "single", "model": "resnet_tiny_test",
                 "pretrained": False, "backbone_opts": {"no_such_opt": 1}},
                classes=["a", "b"], input_size=(16, 16), dtype=jnp.float32)


@pytest.mark.slow
class TestTrajectory:
    def test_ghost_trajectory_tracks_exact(self):
        """Accuracy evidence at test scale: ghost-BN training follows the
        exact-BN loss trajectory closely on a small separable problem (the
        full-scale evidence lives in PERF.md's max-throughput table)."""
        from nkbx.models import get_model
        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

        rng = np.random.default_rng(0)
        n, bsz, steps = 32, 8, 8
        labels = rng.integers(0, 2, n).astype(np.int64)
        x = rng.normal(size=(n, 16, 16, 3)).astype(np.float32) * 0.4
        x[labels == 1, :, :, 0] += 1.2

        def run(ghost):
            cfg = {"task": "single", "model": "resnet_tiny_test",
                   "pretrained": False}
            if ghost:
                cfg["backbone_opts"] = {"ghost_bn": 4}
            model = get_model(cfg, classes=["a", "b"], input_size=(16, 16),
                              seed=0, dtype=jnp.float32)
            criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
            bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
            step = build_train_step(model, criterion, bundle)
            state = TrainState.create(model.params, model.batch_stats, bundle.tx)
            key, one = jax.random.PRNGKey(0), jnp.asarray(1.0)
            losses = []
            for i in range(steps):
                s = slice((i % 4) * bsz, (i % 4 + 1) * bsz)
                state, metrics = step(state, jnp.asarray(x[s]),
                                      jnp.asarray(labels[s]),
                                      jnp.ones(bsz, bool), key, one, one)
                losses.append(float(metrics["loss"]))
            return np.asarray(losses)

        exact, ghost = run(False), run(True)
        # ghost-BN IS a different algorithm, so point-wise loss equality is
        # not the claim — the claim is it optimizes the same problem to the
        # same place at the same pace (both solve it; bounded average drift)
        assert exact[-1] < 0.05 and ghost[-1] < 0.05, (exact, ghost)
        assert np.abs(exact - ghost).mean() < 0.2, (exact, ghost)


@pytest.mark.slow
def test_bf16_master_trajectory_tracks_exact():
    """bf16 master weights (max-throughput tier knob, measured NEGATIVE on
    chip — PERF.md r4): still must train correctly. Same small problem as
    the ghost trajectory test; fp32 vs bf16 masters both converge with
    bounded drift."""
    from nkbx.models import get_model
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    rng = np.random.default_rng(0)
    n, bsz, steps = 32, 8, 8
    labels = rng.integers(0, 2, n).astype(np.int64)
    x = rng.normal(size=(n, 16, 16, 3)).astype(np.float32) * 0.4
    x[labels == 1, :, :, 0] += 1.2

    def run(master_dtype):
        model = get_model({"task": "single", "model": "resnet_tiny_test",
                           "pretrained": False}, classes=["a", "b"],
                          input_size=(16, 16), seed=0, dtype=jnp.float32)
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        step = build_train_step(model, criterion, bundle)
        state = TrainState.create(model.params, model.batch_stats, bundle.tx,
                                  master_dtype=master_dtype)
        key, one = jax.random.PRNGKey(0), jnp.asarray(1.0)
        losses = []
        for i in range(steps):
            s = slice((i % 4) * bsz, (i % 4 + 1) * bsz)
            state, metrics = step(state, jnp.asarray(x[s]),
                                  jnp.asarray(labels[s]),
                                  jnp.ones(bsz, bool), key, one, one)
            losses.append(float(metrics["loss"]))
        return np.asarray(losses)

    exact, bf16m = run(None), run(jnp.bfloat16)
    assert exact[-1] < 0.05 and bf16m[-1] < 0.05, (exact, bf16m)
    assert np.abs(exact - bf16m).mean() < 0.2, (exact, bf16m)
