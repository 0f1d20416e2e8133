"""Fused Pallas MLP (nkbx/ops/mlp.py) vs the plain-XLA path.

Runs the kernel in interpreter mode on the forced-CPU backend (conftest);
on TPU the same code compiles via Mosaic. Covers forward/gradients against
the flax-Dense reference program, leading-dim flattening, the VMEM
viability gate, the mesh-sharded twin, and the ConvNeXt model-level flag
(same function, same gradients, same param paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nkbx.ops.mlp import (
    fused_ln_mlp,
    fused_mlp,
    fused_mlp_viable,
    reference_ln_mlp,
    reference_mlp,
)

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'



def _inputs(r, c, f, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(r, c), dtype)
    w0 = jnp.asarray(rng.randn(c, f) * (c ** -0.5), dtype)
    b0 = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(f, c) * (f ** -0.5), dtype)
    b1 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    return x, w0, b0, w1, b1


CASES = [
    # (rows, C, F) — F = 4C mixing shape and a non-4x ratio
    (256, 32, 128),
    (384, 48, 192),
    (512, 16, 24),
    # rows with no >=128 divisor tile (2^2·5·13 and 2^6·197 / 32 — the ViT
    # B·197-token shape): exercises the masked final tile
    (260, 32, 128),
    (394, 48, 192),
]


@pytest.mark.parametrize("r,c,f", CASES)
def test_forward_matches_reference(r, c, f):
    x, w0, b0, w1, b1 = _inputs(r, c, f)
    got = fused_mlp(x, w0, b0, w1, b1, True)
    want = reference_mlp(x, w0, b0, w1, b1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("r,c,f", CASES)
def test_gradients_match_reference(r, c, f):
    x, w0, b0, w1, b1 = _inputs(r, c, f, seed=1)
    co = jnp.asarray(np.random.RandomState(2).randn(r, c), jnp.float32)

    def loss_fused(x, w0, b0, w1, b1):
        return jnp.sum(fused_mlp(x, w0, b0, w1, b1, True) * co)

    def loss_ref(x, w0, b0, w1, b1):
        return jnp.sum(reference_mlp(x, w0, b0, w1, b1) * co)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w0, b0, w1, b1)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w0, b0, w1, b1)
    for name, a, b in zip("x w0 b0 w1 b1".split(), got, want):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)


def test_leading_dims_flattened():
    x, w0, b0, w1, b1 = _inputs(2 * 8 * 16, 32, 128, seed=3)
    x4 = x.reshape(2, 8, 16, 32)
    got = fused_mlp(x4, w0, b0, w1, b1, True)
    assert got.shape == (2, 8, 16, 32)
    np.testing.assert_allclose(got.reshape(-1, 32),
                               fused_mlp(x, w0, b0, w1, b1, True),
                               rtol=1e-6, atol=1e-6)


def test_grad_dtypes_match_primals():
    x, w0, b0, w1, b1 = _inputs(256, 32, 128, seed=4, dtype=jnp.bfloat16)

    def loss(x, w0, b0, w1, b1):
        return jnp.sum(fused_mlp(x, w0, b0, w1, b1, True).astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w0, b0, w1, b1)
    for a, p in zip(g, (x, w0, b0, w1, b1)):
        assert a.dtype == p.dtype and a.shape == p.shape


class TestViabilityGate:
    def test_stage_geometries(self):
        # ConvNeXt stages 1-3 at bs=64 @224 fit; stage 4 / ViT-B (C=768,
        # F=3072) blow the resident dW VMEM budget and must route to XLA.
        assert fused_mlp_viable(64 * 56 * 56, 96, 384)
        assert fused_mlp_viable(64 * 28 * 28, 192, 768)
        assert fused_mlp_viable(64 * 14 * 14, 384, 1536)
        assert not fused_mlp_viable(64 * 7 * 7, 768, 3072)

    def test_small_rows_not_viable(self):
        assert not fused_mlp_viable(127, 96, 384)  # under the 128-row floor

    def test_indivisible_rows_viable_via_masking(self):
        # ViT-B/16 token rows at bs=64: 64·197 has no ≥128 divisor — the
        # masked final tile makes it viable anyway (C=384 = vit_small).
        assert fused_mlp_viable(64 * 197, 384, 1536)

    def test_unviable_call_raises(self):
        x, w0, b0, w1, b1 = _inputs(127, 32, 128)
        with pytest.raises(ValueError, match="fused_mlp_viable"):
            fused_mlp(x, w0, b0, w1, b1, True)


class TestMeshSharded:
    """Under a declared ops mesh the kernel runs per-shard inside
    jax.shard_map (rows on the data axis); dw/db are summed across shards.
    Must equal the single-device fused op exactly (the op is purely batched
    over rows)."""

    def _mesh(self):
        from nkbx.parallel import make_mesh

        return make_mesh(n_data=8)

    def test_sharded_matches_local(self):
        from nkbx.ops.attention import attention_mesh
        from nkbx.parallel import batch_sharding

        mesh = self._mesh()
        r, c, f = 8 * 256, 32, 128
        x, w0, b0, w1, b1 = _inputs(r, c, f, seed=11)
        co = jnp.asarray(np.random.RandomState(12).randn(r, c), jnp.float32)

        def loss(x, w0, b0, w1, b1):
            return jnp.sum(fused_mlp(x, w0, b0, w1, b1, True) * co)

        want_out = fused_mlp(x, w0, b0, w1, b1, True)
        want_g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w0, b0, w1, b1)

        xs = jax.device_put(x, batch_sharding(mesh))
        with attention_mesh(mesh):
            got_out = fused_mlp(xs, w0, b0, w1, b1, True)
            got_g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(xs, w0, b0, w1, b1)
        np.testing.assert_allclose(got_out, want_out, rtol=2e-5, atol=2e-5)
        for name, a, b in zip("x w0 b0 w1 b1".split(), got_g, want_g):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)

    def test_indivisible_rows_error(self):
        from nkbx.ops.attention import attention_mesh

        mesh = self._mesh()
        x, w0, b0, w1, b1 = _inputs(8 * 256 + 4, 32, 128)
        with attention_mesh(mesh):
            with pytest.raises(ValueError, match="divisible"):
                fused_mlp(x, w0, b0, w1, b1, True)

    def test_gate_accounts_for_per_shard_rows(self):
        # the kernel runs per-shard under the mesh, so the model-level gate
        # must size rows/ndev, not the global row count: 288 rows are viable
        # single-device (row tile 144) but 288/8 = 36 is under the 128-row
        # floor; 260 rows don't divide the 8-way axis at all. Both must
        # resolve to the XLA path (gate False/None), not raise at trace time
        # inside jax.shard_map.
        from nkbx.ops.attention import attention_mesh
        from nkbx.ops.mlp import fused_mlp_mode, use_fused_mlp

        mesh = self._mesh()
        assert fused_mlp_viable(288, 384, 1536)
        assert use_fused_mlp(True, 288, 384, 1536, 2)
        with attention_mesh(mesh):
            assert not use_fused_mlp(True, 288, 384, 1536, 2)
            assert fused_mlp_mode(True, 260, 32, 128, 2) is None
            # a shardable, per-shard-viable geometry stays fused
            assert use_fused_mlp(True, 8 * 256, 32, 128, 2)

    def test_gate_symbolic_rows_fall_back(self):
        # jax.export symbolic leading dims can't produce a static row count:
        # mlp_tail passes rows=None, which must resolve to the XLA path
        # everywhere (gate False, mode None) instead of doing arithmetic on
        # a symbolic dim — regression for the --dynamic export trace.
        from nkbx.ops.attention import attention_mesh
        from nkbx.ops.mlp import fused_mlp_mode, use_fused_mlp

        assert not use_fused_mlp(True, None, 384, 1536, 2)
        assert fused_mlp_mode(True, None, 384, 1536, 2) is None
        with attention_mesh(self._mesh()):
            assert not use_fused_mlp(True, None, 384, 1536, 2)


class TestConvNeXtIntegration:
    """fused_mlp=True must be a pure reparametrization of the block: same
    param tree, same outputs/gradients (up to kernel-vs-XLA rounding)."""

    def _models(self):
        from nkbx.models.convnext import ConvNeXt

        base = ConvNeXt(depths=(1, 1), dims=(16, 32), dtype=jnp.float32,
                        fused_mlp=False)
        fused = ConvNeXt(depths=(1, 1), dims=(16, 32), dtype=jnp.float32,
                         fused_mlp=True)
        return base, fused

    def test_same_params_outputs_grads(self):
        base, fused = self._models()
        rng = np.random.default_rng(0)
        # 64x64 input -> stage rows 2*16*16=512 and 2*8*8=128, both viable
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        v = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        vf = fused.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(v)
        for a, b in zip(jax.tree_util.tree_leaves(vf), jax.tree_util.tree_leaves(v)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        y0 = base.apply(v, x, train=False)
        y1 = fused.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=5e-5, atol=5e-5)

        def grads(m):
            def f(p):
                return jnp.sum(m.apply({"params": p}, x, train=True) ** 2)
            return jax.grad(f)(v["params"])

        g0, g1 = grads(base), grads(fused)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)

    def test_auto_is_off_on_cpu(self):
        from nkbx.ops.mlp import fused_mlp_mode

        assert fused_mlp_mode(None, 64 * 56 * 56, 96, 384, 2) is None

    def test_env_override_forces_off(self, monkeypatch):
        from nkbx.ops.mlp import fused_mlp_mode

        monkeypatch.setenv("NKBX_FUSED_MLP", "0")
        assert fused_mlp_mode(True, 64 * 56 * 56, 96, 384, 2) is None

    def test_export_context_forces_off(self):
        from nkbx.ops.attention import disable_fused
        from nkbx.ops.mlp import fused_mlp_mode

        with disable_fused():
            assert fused_mlp_mode(True, 64 * 56 * 56, 96, 384, 2) is None


class TestLnFused:
    """LN+MLP+layer-scale+residual fused kernel vs the plain-XLA twin."""

    def _inputs(self, r, c, f, seed=0):
        rng = np.random.RandomState(seed)
        return (jnp.asarray(rng.randn(r, c), jnp.float32),
                jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32),
                jnp.asarray(0.1 * rng.randn(c), jnp.float32),
                jnp.asarray(rng.randn(c, f) * c ** -0.5, jnp.float32),
                jnp.asarray(0.1 * rng.randn(f), jnp.float32),
                jnp.asarray(rng.randn(f, c) * f ** -0.5, jnp.float32),
                jnp.asarray(0.1 * rng.randn(c), jnp.float32),
                jnp.asarray(rng.randn(r, c), jnp.float32),
                jnp.asarray(1e-2 * rng.randn(c), jnp.float32))

    # divisible and masked-final-tile row counts
    @pytest.mark.parametrize("r,c,f", [(256, 32, 128), (260, 32, 128)])
    def test_forward_and_grads_match_reference(self, r, c, f):
        x, s, b, w0, b0, w1, b1, sc, g = self._inputs(r, c, f)
        co = jnp.asarray(np.random.RandomState(9).randn(r, c), jnp.float32)

        got = fused_ln_mlp(x, s, b, w0, b0, w1, b1, sc, gamma=g,
                           interpret=True)
        want = reference_ln_mlp(x, s, b, w0, b0, w1, b1, sc, gamma=g)
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)

        def lf(*a):
            return jnp.sum(fused_ln_mlp(*a[:8], gamma=a[8], interpret=True) * co)

        def lr(*a):
            return jnp.sum(reference_ln_mlp(*a[:8], gamma=a[8]) * co)

        ga = jax.grad(lf, argnums=tuple(range(9)))(x, s, b, w0, b0, w1, b1, sc, g)
        gw = jax.grad(lr, argnums=tuple(range(9)))(x, s, b, w0, b0, w1, b1, sc, g)
        for name, a_, b_ in zip("x s b w0 b0 w1 b1 sc gamma".split(), ga, gw):
            np.testing.assert_allclose(a_, b_, rtol=3e-4, atol=3e-4,
                                       err_msg=name)

    def test_self_residual_cotangents_sum(self):
        # Swin-style: the same array as x and shortcut — JAX must sum the
        # dx and d(shortcut) cotangents (checked against the XLA twin).
        x, s, b, w0, b0, w1, b1, _, _ = self._inputs(392, 16, 64, seed=3)
        co = jnp.asarray(np.random.RandomState(4).randn(392, 16), jnp.float32)

        def lf(x):
            return jnp.sum(fused_ln_mlp(x, s, b, w0, b0, w1, b1, x,
                                        eps=1e-5, interpret=True) * co)

        def lr(x):
            return jnp.sum(reference_ln_mlp(x, s, b, w0, b0, w1, b1, x,
                                            eps=1e-5) * co)

        np.testing.assert_allclose(jax.grad(lf)(x), jax.grad(lr)(x),
                                   rtol=3e-4, atol=3e-4)

    def test_mode_resolution(self, monkeypatch):
        from nkbx.ops.mlp import fused_mlp_mode

        assert fused_mlp_mode(True, 64 * 3136, 96, 384, 2) == "ln"
        monkeypatch.setenv("NKBX_FUSED_LN_MLP", "0")
        assert fused_mlp_mode(True, 64 * 3136, 96, 384, 2) == "mlp"
        assert fused_mlp_mode(False, 64 * 3136, 96, 384, 2) is None

    def test_mesh_sharded_matches_local(self):
        from nkbx.ops.attention import attention_mesh
        from nkbx.parallel import batch_sharding, make_mesh

        mesh = make_mesh(n_data=8)
        r, c, f = 8 * 256, 32, 128
        x, s, b, w0, b0, w1, b1, sc, g = self._inputs(r, c, f, seed=11)
        co = jnp.asarray(np.random.RandomState(12).randn(r, c), jnp.float32)

        def loss(x, s, b, w0, b0, w1, b1, sc, g):
            return jnp.sum(fused_ln_mlp(x, s, b, w0, b0, w1, b1, sc,
                                        gamma=g, interpret=True) * co)

        want_out = fused_ln_mlp(x, s, b, w0, b0, w1, b1, sc, gamma=g,
                                interpret=True)
        want_g = jax.grad(loss, argnums=tuple(range(9)))(
            x, s, b, w0, b0, w1, b1, sc, g)

        xs = jax.device_put(x, batch_sharding(mesh))
        scs = jax.device_put(sc, batch_sharding(mesh))
        with attention_mesh(mesh):
            got_out = fused_ln_mlp(xs, s, b, w0, b0, w1, b1, scs, gamma=g,
                                   interpret=True)
            got_g = jax.grad(loss, argnums=tuple(range(9)))(
                xs, s, b, w0, b0, w1, b1, scs, g)
        np.testing.assert_allclose(got_out, want_out, rtol=2e-5, atol=2e-5)
        for name, a_, b_ in zip("x s b w0 b0 w1 b1 sc gamma".split(),
                                got_g, want_g):
            np.testing.assert_allclose(a_, b_, rtol=3e-4, atol=3e-4,
                                       err_msg=name)

    def test_model_mlp_only_mode_still_exact(self, monkeypatch):
        # NKBX_FUSED_LN_MLP=0 keeps the MLP-only kernel path alive — the
        # model must still be an exact reparametrization through it.
        from nkbx.models.convnext import ConvNeXt

        monkeypatch.setenv("NKBX_FUSED_LN_MLP", "0")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        base = ConvNeXt(depths=(1, 1), dims=(16, 32), dtype=jnp.float32,
                        fused_mlp=False)
        fused = ConvNeXt(depths=(1, 1), dims=(16, 32), dtype=jnp.float32,
                         fused_mlp=True)
        v = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        np.testing.assert_allclose(
            np.asarray(fused.apply(v, x, train=False)),
            np.asarray(base.apply(v, x, train=False)), rtol=5e-5, atol=5e-5)


class TestSwinIntegration:
    """Swin fc1/fc2 fused_mlp=True must be a pure reparametrization."""

    def _models(self):
        from nkbx.models.swin import SwinTransformer

        kw = dict(embed_dim=16, depths=(1, 1), n_heads=(2, 4), window=7,
                  dtype=jnp.float32)
        return (SwinTransformer(fused_mlp=False, **kw),
                SwinTransformer(fused_mlp=True, **kw))

    def test_same_params_outputs_grads(self):
        base, fused = self._models()
        rng = np.random.default_rng(0)
        # 56x56 input -> 14x14 then 7x7 token grids; rows 2*196=392, 2*49=98
        # (stage 2's 98 rows fail the >=128 tile rule and stay XLA — the
        # mixed program must still be exact)
        x = jnp.asarray(rng.standard_normal((2, 56, 56, 3)).astype(np.float32))
        v = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        vf = fused.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(v)

        np.testing.assert_allclose(
            np.asarray(fused.apply(v, x, train=False)),
            np.asarray(base.apply(v, x, train=False)), rtol=5e-5, atol=5e-5)

        def grads(m):
            def f(p):
                return jnp.sum(m.apply({"params": p}, x, train=True) ** 2)
            return jax.grad(f)(v["params"])

        g0, g1 = grads(base), grads(fused)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)


class TestViTIntegration:
    """ViT Dense_0/Dense_1 fused_mlp=True must be a pure reparametrization;
    dropout in the MLP (train only) must force the XLA path."""

    def _models(self, drop=0.0):
        from nkbx.models.vit import ViT

        kw = dict(patch_size=8, dim=32, depth=1, n_heads=2,
                  drop_rate=drop, dtype=jnp.float32)
        return ViT(fused_mlp=False, **kw), ViT(fused_mlp=True, **kw)

    def test_same_params_outputs_grads(self):
        # 8x8 grid + cls = 65 tokens -> rows=4*65=260 has no >=128 divisor:
        # exercises the masked-final-tile path at the model level.
        from nkbx.models.vit import ViT

        rng = np.random.default_rng(0)
        kw = dict(patch_size=8, dim=32, depth=1, n_heads=2,
                  dtype=jnp.float32)
        base, fused = ViT(fused_mlp=False, **kw), ViT(fused_mlp=True, **kw)
        x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
        v = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        vf = fused.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(v)

        np.testing.assert_allclose(
            np.asarray(fused.apply(v, x, train=False)),
            np.asarray(base.apply(v, x, train=False)), rtol=5e-5, atol=5e-5)

        def grads(m):
            def f(p):
                return jnp.sum(m.apply({"params": p}, x, train=True) ** 2)
            return jax.grad(f)(v["params"])

        g0, g1 = grads(base), grads(fused)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)

    def test_dropout_train_forces_xla_path(self):
        # with drop_rate>0 the fused program must not be used in train mode:
        # the traced train-mode module must contain a Dropout RNG use and
        # still match param structure. (On CPU auto is off anyway, so force
        # fused=True and check apply() with dropout doesn't raise and
        # consumes the dropout rng.)
        base, fused = self._models(drop=0.5)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
        v = fused.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        y0 = fused.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        y1 = fused.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(y0), np.asarray(y1))

    def test_unicom_threads_flag(self):
        from nkbx.models.vit import UnicomViT

        m = UnicomViT(patch_size=8, dim=32, depth=1, n_heads=2,
                      input_size=64, embedding_size=16, fused_mlp=True,
                      dtype=jnp.float32)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
        v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        m0 = m.clone(fused_mlp=False)
        np.testing.assert_allclose(
            np.asarray(m.apply(v, x, train=False)),
            np.asarray(m0.apply(v, x, train=False)), rtol=5e-5, atol=5e-5)


def test_fsdp_with_mesh_and_fused_convnext():
    """FSDP-scattered params train through the fused LN+MLP kernel under a
    declared mesh and match the replicated run — the MLP-kernel twin of
    test_fused_attention.test_fsdp_with_mesh_and_fused_swin. Geometry sized
    so the PER-SHARD rows clear the kernel's 128-row floor (batch 16 x 8x8
    tokens = 1024 rows -> 128/shard on the 8-way axis)."""
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.convnext import ConvNeXt
    from nkbx.ops.attention import set_attention_mesh
    from nkbx.parallel import make_mesh, state_shardings
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer
    from nkbx.train.engine import train_epoch

    bb = ConvNeXt(depths=(1,), dims=(16,), dtype=jnp.float32, fused_mlp=True)
    module = SingletaskClassifier(backbone=bb, n_classes=3)
    variables = dict(module.init({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 32, 32, 3)), train=False))
    model = ClassificationModel(module, variables, ["a", "b", "c"], "single", 16)
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})

    rng = np.random.default_rng(0)
    X = np.stack([np.full((32, 32, 3), (i % 3) * 0.3, np.float32)
                  + rng.normal(0, .05, (32, 32, 3)) for i in range(32)]
                 ).astype(np.float32)
    Y = (np.arange(32) % 3).astype(np.int64)

    class Loader:
        def epoch(self, e):
            for b in range(2):
                sl = slice(b * 16, (b + 1) * 16)
                yield {"image": X[sl], "label": Y[sl],
                       "mask": np.ones(16, bool)}

    mesh = make_mesh(n_data=8)
    try:
        losses = []
        for fsdp in (True, False):
            bundle = get_optimizer(model.params, {"type": "adam", "lr": 5e-3})
            step = build_train_step(model, criterion, bundle)
            state = TrainState.create(model.params, model.batch_stats,
                                      bundle.tx)
            if fsdp:
                state = jax.device_put(
                    state, state_shardings(mesh, state, fsdp=True))
            state, res = train_epoch(state, Loader(), step, 0,
                                     jax.random.PRNGKey(0), 1.0, 1.0,
                                     mesh=mesh, progress=False)
            losses.append(float(np.mean(res["running_loss"])))
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    finally:
        set_attention_mesh(None)


def test_grad_accum_with_mesh_and_fused_convnext():
    """grad_accum_steps=2 halves the microbatch, halving the kernel's
    per-shard rows (1024 -> 512 rows -> 64/shard, under the 128-row floor):
    the gate must re-evaluate per trace and silently route the microbatched
    step to XLA while the unaccumulated step stays fused — and the two runs
    must still match (ConvNeXt has no BatchNorm, so accumulation is exact)."""
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.convnext import ConvNeXt
    from nkbx.ops.attention import set_attention_mesh
    from nkbx.parallel import make_mesh
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer
    from nkbx.train.engine import train_epoch

    bb = ConvNeXt(depths=(1,), dims=(16,), dtype=jnp.float32, fused_mlp=True)
    module = SingletaskClassifier(backbone=bb, n_classes=3)
    variables = dict(module.init({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 32, 32, 3)), train=False))
    model = ClassificationModel(module, variables, ["a", "b", "c"], "single", 16)
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})

    rng = np.random.default_rng(1)
    X = np.stack([np.full((32, 32, 3), (i % 3) * 0.3, np.float32)
                  + rng.normal(0, .05, (32, 32, 3)) for i in range(32)]
                 ).astype(np.float32)
    Y = (np.arange(32) % 3).astype(np.int64)

    class Loader:
        def epoch(self, e):
            for b in range(2):
                sl = slice(b * 16, (b + 1) * 16)
                yield {"image": X[sl], "label": Y[sl],
                       "mask": np.ones(16, bool)}

    mesh = make_mesh(n_data=8)
    try:
        losses = []
        for accum in (2, 1):
            bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
            step = build_train_step(model, criterion, bundle,
                                    grad_accum_steps=accum)
            state = TrainState.create(model.params, model.batch_stats,
                                      bundle.tx)
            state, res = train_epoch(state, Loader(), step, 0,
                                     jax.random.PRNGKey(0), 1.0, 1.0,
                                     mesh=mesh, progress=False)
            losses.append(float(np.mean(res["running_loss"])))
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    finally:
        set_attention_mesh(None)
