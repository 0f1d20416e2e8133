"""Distributed-without-hardware: 8-virtual-device mesh (conftest) — sharded
train step must equal the single-device step numerically (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nkbx.models import get_model
from nkbx.parallel import batch_sharding, make_mesh, replicated_sharding, shard_batch
from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'



@pytest.fixture(scope="module")
def setup():
    model = get_model(
        {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
        ["a", "b"], input_size=(32, 32), dtype=jnp.float32,
    )
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    # sgd: the update is LINEAR in the gradient, so single-vs-sharded
    # differences stay at reduction-order noise (adam's first step is
    # +-lr*sign(g), which flips for near-zero grads under different
    # all-reduce orders)
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 1e-2})
    step = build_train_step(model, criterion, bundle)
    r = np.random.default_rng(0)
    image = r.normal(size=(16, 32, 32, 3)).astype(np.float32)
    label = r.integers(0, 2, size=16).astype(np.int64)
    mask = np.ones(16, dtype=bool)
    return model, bundle, step, image, label, mask


def _run_step(state, step, image, label, mask):
    key = jax.random.PRNGKey(0)
    return step(state, jnp.asarray(image), jnp.asarray(label), jnp.asarray(mask),
                key, jnp.asarray(1.0), jnp.asarray(1.0))


class TestDataParallelEquivalence:
    def test_8device_mesh_available(self):
        assert len(jax.devices()) == 8

    def test_sharded_step_matches_single_device(self, setup):
        model, bundle, step, image, label, mask = setup

        # single device
        state1 = TrainState.create(model.params, model.batch_stats, bundle.tx)
        new1, m1 = _run_step(state1, step, image, label, mask)

        # 8-way data parallel
        mesh = make_mesh(n_data=8)
        state8 = TrainState.create(model.params, model.batch_stats, bundle.tx)
        state8 = jax.device_put(state8, replicated_sharding(mesh))
        batch = shard_batch(mesh, {"image": image, "label": label, "mask": mask})
        new8, m8 = step(state8, batch["image"], batch["label"], batch["mask"],
                        jax.random.PRNGKey(0), jnp.asarray(1.0), jnp.asarray(1.0))

        l1 = jax.tree_util.tree_leaves(new1.params)
        l8 = jax.tree_util.tree_leaves(new8.params)
        for a, b in zip(l1, l8):
            # all-reduce reduction order differs from single-device sum
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)

    def test_batch_is_actually_sharded(self, setup):
        mesh = make_mesh(n_data=8)
        x = np.zeros((16, 4), np.float32)
        sharded = shard_batch(mesh, {"x": x})["x"]
        assert sharded.sharding == batch_sharding(mesh)
        assert len(sharded.addressable_shards) == 8
        assert sharded.addressable_shards[0].data.shape == (2, 4)

    def test_tensor_parallel_spec(self, setup):
        from nkbx.parallel import param_shardings

        model, *_ = setup
        mesh = make_mesh(n_data=4, n_model=2)
        sh = param_shardings(mesh, model.params, tensor_parallel=True)
        leaves = jax.tree_util.tree_leaves(sh, is_leaf=lambda x: hasattr(x, "spec"))
        assert len(leaves) > 0  # spec tree built without error

    def test_fsdp_sharded_step_matches_single_device(self, setup):
        """ZeRO-3-style param sharding over the data axis: XLA's inserted
        all-gather/reduce-scatter must leave the update numerically equal to
        the single-device step."""
        from nkbx.parallel import param_shardings

        model, bundle, step, image, label, mask = setup

        state1 = TrainState.create(model.params, model.batch_stats, bundle.tx)
        new1, m1 = _run_step(state1, step, image, label, mask)

        mesh = make_mesh(n_data=8)
        sh = param_shardings(mesh, model.params, fsdp=True, fsdp_min_size=64)
        # at least one leaf must actually be scattered for this test to bite
        assert any(s.spec != jax.sharding.PartitionSpec()
                   for s in jax.tree_util.tree_leaves(
                       sh, is_leaf=lambda x: hasattr(x, "spec")))
        state8 = TrainState.create(model.params, model.batch_stats, bundle.tx)
        state8 = state8.replace(
            params=jax.device_put(state8.params, sh),
            batch_stats=jax.device_put(state8.batch_stats, replicated_sharding(mesh)),
        )
        batch = shard_batch(mesh, {"image": image, "label": label, "mask": mask})
        new8, m8 = step(state8, batch["image"], batch["label"], batch["mask"],
                        jax.random.PRNGKey(0), jnp.asarray(1.0), jnp.asarray(1.0))

        for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                        jax.tree_util.tree_leaves(new8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)

    def test_fsdp_spec_picks_divisible_dim(self, setup):
        from nkbx.parallel import param_shardings

        model, *_ = setup
        mesh = make_mesh(n_data=8)
        sh = param_shardings(mesh, model.params, fsdp=True, fsdp_min_size=1)
        for leaf, s in zip(jax.tree_util.tree_leaves(model.params),
                           jax.tree_util.tree_leaves(
                               sh, is_leaf=lambda x: hasattr(x, "spec"))):
            for dim, name in enumerate(s.spec):
                if name == "data":
                    assert leaf.shape[dim] % 8 == 0

    def test_state_shardings_full_state(self, setup):
        """state_shardings: adam moments scatter exactly like their params;
        tiny batch_stats vectors and the step counter stay replicated; a step
        from the fully-put state matches the single-device step."""
        from nkbx.parallel import state_shardings
        from nkbx.train import get_optimizer

        model, bundle, step, image, label, mask = setup
        mesh = make_mesh(n_data=8)

        adam = get_optimizer(model.params, {"type": "adam", "lr": 1e-3})
        st = TrainState.create(model.params, model.batch_stats, adam.tx)
        put = jax.device_put(st, state_shardings(mesh, st, fsdp_min_size=64))

        param_specs = {}
        for leaf in jax.tree_util.tree_leaves(put.params):
            param_specs.setdefault(leaf.shape, leaf.sharding.spec)
        scattered = [s for s in param_specs.values()
                     if s != jax.sharding.PartitionSpec()]
        assert scattered, "expected at least one scattered param"
        for leaf in jax.tree_util.tree_leaves(put.opt_state):
            if leaf.shape in param_specs:
                assert leaf.sharding.spec == param_specs[leaf.shape], leaf.shape
        assert put.step.sharding.spec == jax.sharding.PartitionSpec()
        # at the DEFAULT threshold, (C,) batch-stats vectors stay replicated
        put_default = jax.device_put(st, state_shardings(mesh, st))
        for leaf in jax.tree_util.tree_leaves(put_default.batch_stats):
            assert leaf.sharding.spec == jax.sharding.PartitionSpec()

        # numerics: full-state FSDP put + sgd step == single-device step
        state1 = TrainState.create(model.params, model.batch_stats, bundle.tx)
        new1, m1 = _run_step(state1, step, image, label, mask)
        state8 = TrainState.create(model.params, model.batch_stats, bundle.tx)
        state8 = jax.device_put(
            state8, state_shardings(mesh, state8, fsdp_min_size=64))
        batch = shard_batch(mesh, {"image": image, "label": label, "mask": mask})
        new8, m8 = step(state8, batch["image"], batch["label"], batch["mask"],
                        jax.random.PRNGKey(0), jnp.asarray(1.0), jnp.asarray(1.0))
        for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                        jax.tree_util.tree_leaves(new8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
