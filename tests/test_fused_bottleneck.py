"""Fused bottleneck-chain kernel (nkbx/ops/bottleneck.py) equality tests.

The kernel's semantics are TILE-LOCAL BN statistics (max-throughput tier,
see the module docstring): each (ghost_bn x th-row-band) tile is one stat
group. reference_chain is the plain-XLA definition of exactly those
semantics; the kernel must match it (fwd + all grads). When th == H (no row
banding) tile-local stats coincide with the ghost-BN batch groups, so the
fused ResNet path must match the unfused XLA ghost path EXACTLY — outputs,
running stats, and every parameter gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nkbx.ops.bottleneck import chain_tile, fused_chain, reference_chain

B, H, W, C, M, G, TH = 4, 8, 8, 16, 8, 2, 4  # banded: nh = 2


@pytest.fixture(scope="module")
def chain_args():
    rng = np.random.default_rng(0)
    mk = lambda *s, sc=1.0: jnp.asarray(rng.normal(size=s).astype(np.float32) * sc)
    x = mk(B, H, W, C)
    args = (mk(C, M, sc=0.2), mk(3, 3, M, M, sc=0.2), mk(M, C, sc=0.2),
            jnp.asarray(rng.uniform(0.8, 1.2, M).astype(np.float32)), mk(M, sc=0.1),
            jnp.asarray(rng.uniform(0.8, 1.2, M).astype(np.float32)), mk(M, sc=0.1),
            jnp.asarray(rng.uniform(0.8, 1.2, C).astype(np.float32)), mk(C, sc=0.1))
    return x, args


class TestKernelVsTwin:
    def test_forward_and_stats(self, chain_args):
        x, args = chain_args
        out, stats = fused_chain(x, *args, g=G, th=TH)
        ref, rstats = reference_chain(x, *args, g=G, th=TH)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        for s, r in zip(stats, rstats):
            np.testing.assert_allclose(np.asarray(s), np.asarray(r), atol=1e-5)

    def test_all_gradients(self, chain_args):
        x, args = chain_args

        def loss(fn, x, vals):
            out, _ = fn(x, *vals, g=G, th=TH)
            return jnp.sum(out * out * 0.5)

        gf = jax.grad(lambda x, *v: loss(fused_chain, x, v),
                      argnums=tuple(range(10)))(x, *args)
        gr = jax.grad(lambda x, *v: loss(reference_chain, x, v),
                      argnums=tuple(range(10)))(x, *args)
        for name, a, b in zip("x w1 w2 w3 s1 b1 s2 b2 s3 b3".split(), gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4, err_msg=name)

    def test_single_band_has_no_halo(self, chain_args):
        """nh=1 (th=H): both halo rows are image-edge zero padding."""
        x, args = chain_args
        out, _ = fused_chain(x, *args, g=G, th=H)
        ref, _ = reference_chain(x, *args, g=G, th=H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestChainTile:
    def test_resnet50_geometries(self):
        """ResNet-50 @224 bs=128: stages 1-3 must fit, stage 4 must not
        (3x3x512x512 weights + f32 grads alone exceed VMEM)."""
        assert chain_tile(128, 56, 56, 256, 64, 2) is not None
        assert chain_tile(128, 28, 28, 512, 128, 2) is not None
        assert chain_tile(128, 14, 14, 1024, 256, 2) is not None
        assert chain_tile(128, 7, 7, 2048, 512, 2) is None

    def test_invalid_group(self):
        assert chain_tile(5, 8, 8, 64, 16, 2) is None  # g does not divide B
        assert chain_tile(4, 8, 8, 64, 16, 0) is None


class TestResNetIntegration:
    """th == H for the tiny geometry -> fused must EXACTLY match the XLA
    ghost-BN path (same stat groups), pinning the flax glue: param tree
    identity, running-stat updates, and the full gradient set."""

    def _mk(self, fused):
        from nkbx.models.resnet import ResNet, Bottleneck

        return ResNet(stage_sizes=(2,), block_cls=Bottleneck, stem_width=8,
                      dtype=jnp.float32, ghost_bn=2, fused_bottleneck=fused)

    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
        v = self._mk(False).init(jax.random.PRNGKey(0), x, train=False)
        return x, v

    def test_param_tree_identical(self, setup):
        x, v = setup
        vf = self._mk(True).init(jax.random.PRNGKey(0), x, train=False)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(vf))

    def test_outputs_and_running_stats(self, setup):
        x, v = setup
        o0, m0 = self._mk(False).apply(v, x, train=True,
                                       mutable=["batch_stats"])
        o1, m1 = self._mk(True).apply(v, x, train=True,
                                      mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=2e-5)
        flat0 = jax.tree_util.tree_leaves_with_path(m0["batch_stats"])
        flat1 = dict(jax.tree_util.tree_leaves_with_path(m1["batch_stats"]))
        assert flat0
        for path, leaf in flat0:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat1[path]), atol=1e-5,
                err_msg=jax.tree_util.keystr(path))

    def test_all_gradients(self, setup):
        x, v = setup

        def loss(v, fused):
            out, _ = self._mk(fused).apply(v, x, train=True,
                                           mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        g0 = jax.grad(loss)(v, False)
        g1 = dict(jax.tree_util.tree_leaves_with_path(jax.grad(loss)(v, True)))
        for path, leaf in jax.tree_util.tree_leaves_with_path(g0):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(g1[path]), rtol=5e-4, atol=5e-4,
                err_msg=jax.tree_util.keystr(path))

    def test_eval_mode_uses_xla_running_stats(self, setup):
        """fused applies in train mode only; eval goes through the standard
        running-stats path regardless of the flag."""
        x, v = setup
        y0 = self._mk(False).apply(v, x, train=False)
        y1 = self._mk(True).apply(v, x, train=False)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


@pytest.mark.slow
def test_mesh_sharded_matches_unsharded():
    """Under a declared ops mesh the chain lowers per-shard via shard_map
    (batch on the data axis, weight grads summed across shards) — must equal
    the unsharded kernel exactly (same per-tile stat groups: sharding splits
    the batch at group boundaries)."""
    from jax.sharding import Mesh

    from nkbx.ops.attention import attention_mesh

    rng = np.random.default_rng(7)
    mk = lambda *s, sc=1.0: jnp.asarray(rng.normal(size=s).astype(np.float32) * sc)
    x = mk(16, H, W, C)  # 16 = 8 devices x ghost group 2
    args = (mk(C, M, sc=0.2), mk(3, 3, M, M, sc=0.2), mk(M, C, sc=0.2),
            jnp.asarray(rng.uniform(0.8, 1.2, M).astype(np.float32)), mk(M, sc=0.1),
            jnp.asarray(rng.uniform(0.8, 1.2, M).astype(np.float32)), mk(M, sc=0.1),
            jnp.asarray(rng.uniform(0.8, 1.2, C).astype(np.float32)), mk(C, sc=0.1))

    def loss(x, *vals):
        out, _ = fused_chain(x, *vals, g=G, th=TH)
        return jnp.sum(out * out * 0.5)

    base_out, base_stats = fused_chain(x, *args, g=G, th=TH)
    base_grads = jax.grad(loss, argnums=tuple(range(10)))(x, *args)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    with attention_mesh(mesh):
        sh_out, sh_stats = fused_chain(x, *args, g=G, th=TH)
        sh_grads = jax.grad(loss, argnums=tuple(range(10)))(x, *args)
    np.testing.assert_allclose(np.asarray(sh_out), np.asarray(base_out),
                               atol=1e-5)
    for a, b in zip(sh_stats, base_stats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for name, a, b in zip("x w1 w2 w3 s1 b1 s2 b2 s3 b3".split(),
                          sh_grads, base_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


@pytest.mark.slow
def test_train_step_with_fused_bottleneck():
    """End-to-end through build_train_step: the donated jitted step trains
    a Bottleneck ResNet with the fused chain enabled and reduces the loss."""
    from nkbx.models.classifier import SingletaskClassifier, ClassificationModel
    from nkbx.models.resnet import ResNet, Bottleneck
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

    backbone = ResNet(stage_sizes=(2,), block_cls=Bottleneck, stem_width=8,
                      dtype=jnp.float32, ghost_bn=2, fused_bottleneck=True)
    module = SingletaskClassifier(backbone=backbone, n_classes=2)
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = dict(module.init({"params": jax.random.PRNGKey(0)}, x0,
                                 train=False))
    model = ClassificationModel(module, variables, ["a", "b"], "single",
                                backbone.num_features)
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
    step = build_train_step(model, criterion, bundle)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx)

    labels = rng.integers(0, 2, 8).astype(np.int64)
    x = rng.normal(size=(8, 16, 16, 3)).astype(np.float32) * 0.4
    x[labels == 1, :, :, 0] += 1.2
    key, one = jax.random.PRNGKey(0), jnp.asarray(1.0)
    losses = []
    for _ in range(6):
        state, metrics = step(state, jnp.asarray(x), jnp.asarray(labels),
                              jnp.ones(8, bool), key, one, one)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses
