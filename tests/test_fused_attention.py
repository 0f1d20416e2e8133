"""Fused Pallas attention (nkbx/ops/attention.py) vs the plain-XLA path.

Runs the kernel in interpreter mode on the forced-CPU backend (conftest);
on TPU the same code compiles via Mosaic. Covers all three mask regimes
(M == 1, W % M == 0 reshape, W < M sliced blocks), both entries (separate
q/k/v and packed qkv), gradients incl. the accumulated bias gradient, and
the model-level swin/vit integration flags."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nkbx.ops.attention import (
    fused_attention,
    fused_attention_qkv,
    reference_attention,
)

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'



def _inputs(g, n, heads, d, m, seed=0, bias_heads=None):
    rng = np.random.RandomState(seed)
    hd = heads * d
    q, k, v = (jnp.asarray(rng.randn(g, n, hd), jnp.float32) for _ in range(3))
    bias = jnp.asarray(rng.randn(bias_heads or heads, n, n) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.rand(m, n, n) < 0.2, -100.0, 0.0), jnp.float32)
    return q, k, v, bias, mask


CASES = [
    # (G, N, heads, d, M) — M=1 broadcast; W%M==0 reshape; W<M slice path
    (8, 9, 2, 8, 1),
    (8, 9, 2, 8, 4),
    (64, 5, 1, 8, 64),
    (6, 13, 3, 4, 3),
    # heads >= 8 exercises the head-batched cores in all three mask regimes
    (8, 9, 8, 4, 1),
    (8, 9, 8, 4, 4),
    (64, 5, 8, 4, 64),
]


@pytest.mark.parametrize("g,n,heads,d,m", CASES)
def test_forward_matches_reference(g, n, heads, d, m):
    q, k, v, bias, mask = _inputs(g, n, heads, d, m)
    scale = d ** -0.5
    got = fused_attention(q, k, v, bias, mask, scale, heads, True)
    want = reference_attention(q, k, v, bias, mask, scale, heads)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bias_broadcast_single_head_slot():
    q, k, v, bias, mask = _inputs(8, 9, 2, 8, 1, bias_heads=1)
    scale = 8 ** -0.5
    got = fused_attention(q, k, v, bias, mask, scale, 2, True)
    want = reference_attention(q, k, v, bias, mask, scale, 2)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("g,n,heads,d,m", CASES[:3] + CASES[4:])
def test_gradients_match_reference(g, n, heads, d, m):
    q, k, v, bias, mask = _inputs(g, n, heads, d, m, seed=1)
    scale = d ** -0.5
    co = jnp.asarray(np.random.RandomState(2).randn(g, n, heads * d),
                     jnp.float32)

    def loss_fused(q, k, v, bias):
        return jnp.sum(fused_attention(q, k, v, bias, mask, scale, heads, True) * co)

    def loss_ref(q, k, v, bias):
        return jnp.sum(reference_attention(q, k, v, bias, mask, scale, heads) * co)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("q k v bias".split(), got, want):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)


def test_packed_qkv_matches_separate():
    g, n, heads, d, m = 8, 9, 2, 8, 4
    q, k, v, bias, mask = _inputs(g, n, heads, d, m, seed=3)
    scale = d ** -0.5
    qkv = jnp.concatenate([q, k, v], axis=-1)
    got = fused_attention_qkv(qkv, bias, mask, scale, heads, True)
    want = reference_attention(q, k, v, bias, mask, scale, heads)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    co = jnp.asarray(np.random.RandomState(4).randn(g, n, heads * d), jnp.float32)

    def loss_packed(qkv, bias):
        return jnp.sum(fused_attention_qkv(qkv, bias, mask, scale, heads, True) * co)

    def loss_ref(qkv, bias):
        q, k, v = qkv[..., :16], qkv[..., 16:32], qkv[..., 32:]
        return jnp.sum(reference_attention(q, k, v, bias, mask, scale, heads) * co)

    (dqkv, dbias) = jax.grad(loss_packed, argnums=(0, 1))(qkv, bias)
    (dqkv_w, dbias_w) = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(dqkv, dqkv_w, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dbias, dbias_w, rtol=2e-4, atol=2e-4)


def _tiny_swin(fused):
    from nkbx.models.swin import SwinTransformer

    # 16x16 input, patch 4 -> 4x4 grid, window 2 -> shifted block has a mask
    return SwinTransformer(embed_dim=8, depths=(2,), n_heads=(2,), patch_size=4,
                           window=2, fused_attention=fused)


def test_swin_model_fused_matches_xla_path():
    x = jnp.asarray(np.random.RandomState(5).rand(2, 16, 16, 3), jnp.float32)
    params = _tiny_swin(False).init(jax.random.PRNGKey(0), x)

    def out(fused):
        return _tiny_swin(fused).apply(params, x)

    np.testing.assert_allclose(out(True), out(False), rtol=5e-5, atol=5e-5)

    def loss(params, fused):
        return jnp.sum(_tiny_swin(fused).apply(params, x) ** 2)

    gf = jax.grad(loss)(params, True)
    gx = jax.grad(loss)(params, False)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    assert flat_f and len(flat_f) == len(flat_x)
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            leaf, flat_x[path], rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_swin_window12_fused_matches_xla_path():
    """The window12_384 variants' geometry: N = 144 tokens per window (vs 49
    for window 7) with a (23^2, heads) bias table; the kernel's row tiling
    must hold at the larger window. Grid == window here, so the shifted
    block collapses to an unshifted one (upstream Swin semantics)."""
    from nkbx.models.swin import SwinTransformer

    mk = lambda fused: SwinTransformer(
        embed_dim=8, depths=(2,), n_heads=(2,), patch_size=4, window=12,
        fused_attention=fused)
    x = jnp.asarray(np.random.RandomState(7).rand(1, 48, 48, 3), jnp.float32)
    params = mk(False).init(jax.random.PRNGKey(0), x)
    assert params["params"]["stage0_block0"]["attn"][
        "relative_position_bias_table"].shape[0] == 23 ** 2
    np.testing.assert_allclose(mk(True).apply(params, x),
                               mk(False).apply(params, x),
                               rtol=5e-5, atol=5e-5)

    def loss(params, fused):
        return jnp.sum(mk(fused).apply(params, x) ** 2)

    gf = jax.tree_util.tree_leaves_with_path(jax.grad(loss)(params, True))
    gx = dict(jax.tree_util.tree_leaves_with_path(jax.grad(loss)(params, False)))
    assert gf and len(gf) == len(gx)
    for path, leaf in gf:
        np.testing.assert_allclose(leaf, gx[path], rtol=5e-4, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_swin_window12_shifted_fused_matches_xla_path():
    """Grid (24x24) > window (12): the shifted block really rolls and masks —
    the 384-geometry path the grid==window case above collapses away. Covers
    the fused kernel's mask/roll handling at window 12 (real swin_*_384
    stage-1 geometry is 96/48/24 grids)."""
    from nkbx.models.swin import SwinTransformer

    mk = lambda fused: SwinTransformer(
        embed_dim=8, depths=(2,), n_heads=(2,), patch_size=4, window=12,
        fused_attention=fused)
    x = jnp.asarray(np.random.RandomState(11).rand(1, 96, 96, 3), jnp.float32)
    params = mk(False).init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(mk(True).apply(params, x),
                               mk(False).apply(params, x),
                               rtol=5e-5, atol=5e-5)

    def loss(params, fused):
        return jnp.sum(mk(fused).apply(params, x) ** 2)

    gf = jax.tree_util.tree_leaves_with_path(jax.grad(loss)(params, True))
    gx = dict(jax.tree_util.tree_leaves_with_path(jax.grad(loss)(params, False)))
    assert gf and len(gf) == len(gx)
    for path, leaf in gf:
        np.testing.assert_allclose(leaf, gx[path], rtol=5e-4, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_export_force_disables_fused_path():
    """jax.export with a symbolic batch cannot trace the Pallas kernel
    (the block picker needs a concrete window count); export_model wraps
    its trace in disable_fused() so even fused=True models export."""
    import tempfile

    from nkbx.models.classifier import ClassificationModel
    from nkbx.export.stablehlo import export_model, load_exported
    from nkbx.ops.attention import disable_fused, fused_force_disabled

    assert not fused_force_disabled()
    with disable_fused():
        assert fused_force_disabled()
    assert not fused_force_disabled()

    module = _tiny_swin(True)  # explicit fused=True — guard must override
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    model = ClassificationModel(module, dict(variables), ["a", "b"], "single", 8)
    with tempfile.TemporaryDirectory() as d:
        path, _ = export_model(model, (2, 16, 16, 3), f"{d}/m.nkbx",
                               dynamic="batch")
        _, exported = load_exported(path)
        out = exported.call(x)
        np.testing.assert_allclose(
            out, module.apply(variables, x), rtol=1e-5, atol=1e-5)


def test_export_fused_attention_optin():
    """export_model(fused_attention=True) keeps the fused lowering in the
    bundle (TPU-only serving artifact; on this CPU backend the kernel traces
    through interpret mode, so the roundtrip stays runnable) and refuses
    symbolic shapes."""
    import tempfile

    from nkbx.models.classifier import ClassificationModel
    from nkbx.export.stablehlo import export_model, load_exported

    module = _tiny_swin(True)
    x = jnp.asarray(np.random.RandomState(7).rand(2, 16, 16, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    model = ClassificationModel(module, dict(variables), ["a", "b"], "single", 8)
    with tempfile.TemporaryDirectory() as d:
        with pytest.raises(ValueError, match="dynamic"):
            export_model(model, (2, 16, 16, 3), f"{d}/m.nkbx",
                         dynamic="batch", fused_attention=True)
        path, meta = export_model(model, (2, 16, 16, 3), f"{d}/m.nkbx",
                                  dynamic="none", fused_attention=True)
        assert meta["fused_attention"] is True
        meta2, exported = load_exported(path)
        assert meta2["fused_attention"] is True
        np.testing.assert_allclose(
            exported.call(x), module.apply(variables, x), rtol=1e-5, atol=1e-5)


def test_env_override_resolves_flags(monkeypatch):
    from nkbx.ops.attention import disable_fused, resolve_fused

    monkeypatch.delenv("NKBX_FUSED_ATTENTION", raising=False)
    assert resolve_fused(None, True) is True    # family default
    assert resolve_fused(None, False) is False
    assert resolve_fused(True, False) is True   # explicit flag beats default
    assert resolve_fused(False, True) is False
    monkeypatch.setenv("NKBX_FUSED_ATTENTION", "0")
    assert resolve_fused(True, True) is False   # env beats the module flag
    monkeypatch.setenv("NKBX_FUSED_ATTENTION", "1")
    assert resolve_fused(False, False) is True
    with disable_fused():                       # export context beats env
        assert resolve_fused(True, True) is False


def test_auto_mode_group_gate(monkeypatch):
    """NKBX_FUSED_MIN_G routes small-G call sites to XLA per call site (ops
    escape hatch; the shipped default gate is open — the PERF.md round-3 G
    sweep measured all-fused optimal at every Swin G). An explicit module
    flag or env override bypasses the gate."""
    from nkbx.ops import attention
    from nkbx.ops.attention import resolve_fused

    monkeypatch.delenv("NKBX_FUSED_ATTENTION", raising=False)
    monkeypatch.setenv("NKBX_FUSED_MIN_G", "256")
    assert resolve_fused(None, True, groups=4096) is True
    assert resolve_fused(None, True, groups=256) is True
    assert resolve_fused(None, True, groups=64) is False   # small-G -> XLA
    assert resolve_fused(None, True) is True               # no G info: fused
    assert resolve_fused(True, True, groups=64) is True    # explicit flag wins
    assert resolve_fused(None, False, groups=4096) is False
    monkeypatch.setenv("NKBX_FUSED_ATTENTION", "1")
    assert resolve_fused(None, True, groups=64) is True    # env force beats gate
    monkeypatch.delenv("NKBX_FUSED_ATTENTION")
    monkeypatch.delenv("NKBX_FUSED_MIN_G")
    # the shipped default threshold gates exactly as documented
    gate = attention._AUTO_MIN_GROUPS
    assert resolve_fused(None, True, groups=gate) is True
    if gate > 1:
        assert resolve_fused(None, True, groups=gate - 1) is False


def test_vit_model_fused_matches_xla_path():
    from nkbx.models.vit import ViT

    x = jnp.asarray(np.random.RandomState(6).rand(2, 16, 16, 3), jnp.float32)
    mk = lambda fused: ViT(patch_size=8, dim=16, depth=1, n_heads=2,
                           fused_attention=fused)
    params = mk(False).init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(mk(True).apply(params, x),
                               mk(False).apply(params, x),
                               rtol=5e-5, atol=5e-5)

    def loss(params, fused):
        return jnp.sum(mk(fused).apply(params, x) ** 2)

    gf = jax.tree_util.tree_leaves(jax.grad(loss)(params, True))
    gx = jax.tree_util.tree_leaves(jax.grad(loss)(params, False))
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)


class TestMeshSharded:
    """Multi-device path: pallas_call cannot be GSPMD-partitioned, so under a
    declared mesh (set_attention_mesh — the engine does this from its mesh=
    argument) the public entries run the kernel per-shard inside
    jax.shard_map. Per-shard semantics are exact (the op is purely batched
    over G); the bias gradient is psummed by summing per-shard partials."""

    def _mesh(self):
        from nkbx.parallel import make_mesh

        return make_mesh(n_data=8)

    def test_sep_sharded_matches_local(self):
        from nkbx.parallel import batch_sharding
        from nkbx.ops.attention import attention_mesh

        mesh = self._mesh()
        g, n, heads, d, m = 16, 9, 2, 8, 2
        q, k, v, bias, mask = _inputs(g, n, heads, d, m, seed=11)
        scale = d ** -0.5
        co = jnp.asarray(np.random.RandomState(12).randn(g, n, heads * d),
                         jnp.float32)

        def loss(q, k, v, bias):
            return jnp.sum(fused_attention(q, k, v, bias, mask, scale,
                                           heads, True) * co)

        want_out = fused_attention(q, k, v, bias, mask, scale, heads, True)
        want_g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)

        sh = batch_sharding(mesh)
        qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))
        with attention_mesh(mesh):
            got_out = fused_attention(qs, ks, vs, bias, mask, scale, heads, True)
            got_g = jax.grad(loss, argnums=(0, 1, 2, 3))(qs, ks, vs, bias)
        np.testing.assert_allclose(got_out, want_out, rtol=2e-5, atol=2e-5)
        for name, a, b in zip("q k v bias".split(), got_g, want_g):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)

    def test_packed_sharded_matches_local(self):
        from nkbx.parallel import batch_sharding
        from nkbx.ops.attention import attention_mesh

        mesh = self._mesh()
        g, n, heads, d, m = 16, 9, 2, 8, 1
        q, k, v, bias, mask = _inputs(g, n, heads, d, m, seed=13)
        scale = d ** -0.5
        qkv = jnp.concatenate([q, k, v], axis=-1)
        co = jnp.asarray(np.random.RandomState(14).randn(g, n, heads * d),
                         jnp.float32)

        def loss(qkv, bias):
            return jnp.sum(fused_attention_qkv(qkv, bias, mask, scale,
                                               heads, True) * co)

        want_out = fused_attention_qkv(qkv, bias, mask, scale, heads, True)
        want_g = jax.grad(loss, argnums=(0, 1))(qkv, bias)

        qkvs = jax.device_put(qkv, batch_sharding(mesh))
        with attention_mesh(mesh):
            got_out = fused_attention_qkv(qkvs, bias, mask, scale, heads, True)
            got_g = jax.grad(loss, argnums=(0, 1))(qkvs, bias)
        np.testing.assert_allclose(got_out, want_out, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(got_g[0], want_g[0], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got_g[1], want_g[1], rtol=2e-4, atol=2e-4)

    def test_divisibility_errors(self):
        from nkbx.ops.attention import attention_mesh

        mesh = self._mesh()
        q, k, v, bias, mask = _inputs(12, 9, 2, 8, 1, seed=15)
        with attention_mesh(mesh):
            with pytest.raises(ValueError, match="divisible"):
                fused_attention(q, k, v, bias, mask, 0.35, 2, True)
        q, k, v, bias, mask = _inputs(16, 9, 2, 8, 4, seed=16)
        with attention_mesh(mesh):  # 16/8 = 2 per shard, M=4 misaligns
            with pytest.raises(ValueError, match="misaligns"):
                fused_attention(q, k, v, bias, mask, 0.35, 2, True)

    def test_mesh_with_unit_data_axis_stays_local(self):
        from nkbx.parallel import make_mesh
        from nkbx.ops.attention import _active_mesh, attention_mesh

        with attention_mesh(make_mesh(n_data=1, n_model=1,
                                      devices=jax.devices()[:1])):
            assert _active_mesh() is None

    def test_swin_module_under_mesh_matches_replicated(self):
        """End-to-end WindowAttention integration: a jitted swin forward+grad
        with the batch sharded over 8 devices equals the single-device fused
        path (the engine sets the mesh before tracing — mirrored here)."""
        from nkbx.parallel import batch_sharding
        from nkbx.ops.attention import attention_mesh

        module = _tiny_swin(True)
        xb = jnp.asarray(np.random.RandomState(17).rand(8, 16, 16, 3),
                         jnp.float32)
        params = module.init(jax.random.PRNGKey(0), xb)

        def loss(params, x):
            return jnp.sum(module.apply(params, x) ** 2)

        want = loss(params, xb)
        want_g = jax.grad(loss)(params, xb)

        mesh = self._mesh()
        xs = jax.device_put(xb, batch_sharding(mesh))
        with attention_mesh(mesh):
            got = jax.jit(loss)(params, xs)
            got_g = jax.jit(jax.grad(loss))(params, xs)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(got_g),
                jax.tree_util.tree_leaves(want_g)):
            np.testing.assert_allclose(
                a, b, rtol=5e-4, atol=5e-4,
                err_msg=jax.tree_util.keystr(path))


def test_epoch_scopes_the_attention_mesh():
    """train_epoch declares its mesh SCOPED to the epoch: a mesh=None epoch
    runs the plain single-device path even while the caller has a mesh
    declared, a meshed epoch does not leak its mesh into later traces, and
    in both cases the caller's own declaration is restored on return."""
    from nkbx.models import get_model
    from nkbx.ops.attention import _active_mesh, attention_mesh
    from nkbx.parallel import make_mesh
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer
    from nkbx.train.engine import train_epoch

    model = get_model(
        {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
        classes=["a", "b"], input_size=(32, 32), seed=0, dtype=jnp.float32)
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.1})
    step = build_train_step(model, criterion, bundle)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx)

    class Loader:
        def epoch(self, e):
            r = np.random.default_rng(0)
            yield {"image": r.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8),
                   "label": np.zeros(8, np.int64), "mask": np.ones(8, bool)}

        def __len__(self):
            return 1

    mesh = make_mesh(n_data=8)

    # a meshed epoch must not leak its mesh
    state, _ = train_epoch(state, Loader(), step, 0, jax.random.PRNGKey(0),
                           1.0, 1.0, mesh=mesh, progress=False)
    assert _active_mesh() is None

    # ... and must restore (not clobber) a mesh the caller declared
    with attention_mesh(mesh):
        train_epoch(state, Loader(), step, 1, jax.random.PRNGKey(1), 1.0, 1.0,
                    mesh=None, progress=False)
        assert _active_mesh() is not None
    assert _active_mesh() is None


def _swin_engine_fixture():
    """(step-builder inputs, loader) for engine-level mesh integration tests."""
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.swin import SwinTransformer
    from nkbx.train import get_loss

    bb = SwinTransformer(embed_dim=8, depths=(2,), n_heads=(2,), patch_size=4,
                         window=2, fused_attention=True, dtype=jnp.float32)
    module = SingletaskClassifier(backbone=bb, n_classes=3)
    variables = dict(module.init({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 16, 16, 3)), train=False))
    model = ClassificationModel(module, variables, ["a", "b", "c"], "single", 8)
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})

    rng = np.random.default_rng(0)
    X = np.stack([np.full((16, 16, 3), (i % 3) * 0.3, np.float32)
                  + rng.normal(0, .05, (16, 16, 3)) for i in range(32)]
                 ).astype(np.float32)
    Y = (np.arange(32) % 3).astype(np.int64)

    class Loader:
        def epoch(self, e):
            for b in range(2):
                sl = slice(b * 16, (b + 1) * 16)
                yield {"image": X[sl], "label": Y[sl],
                       "mask": np.ones(16, bool)}

        def __len__(self):
            return 2

    return model, criterion, Loader


def test_scan_steps_with_mesh_and_fused_swin():
    """steps_per_dispatch>1 nests the shard_map'd Pallas kernel inside
    lax.scan under the mesh — must trace, run, and match the unscanned run."""
    from nkbx.parallel import make_mesh
    from nkbx.train import TrainState, build_train_step, get_optimizer
    from nkbx.train.engine import train_epoch
    from nkbx.ops.attention import set_attention_mesh

    mesh = make_mesh(n_data=8)
    model, criterion, Loader = _swin_engine_fixture()
    try:
        losses = []
        for scan_steps in (2, 1):
            bundle = get_optimizer(model.params, {"type": "adam", "lr": 5e-3})
            step = build_train_step(model, criterion, bundle,
                                    scan_steps=scan_steps)
            state = TrainState.create(model.params, model.batch_stats,
                                      bundle.tx)
            state, res = train_epoch(state, Loader(), step, 0,
                                     jax.random.PRNGKey(0), 1.0, 1.0,
                                     mesh=mesh, progress=False)
            losses.append(float(np.mean(res["running_loss"])))
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    finally:
        set_attention_mesh(None)


def test_fsdp_with_mesh_and_fused_swin():
    """FSDP-scattered params (incl. the attention bias — replicated into the
    shard_map by GSPMD all-gather) train through the fused kernel and match
    the replicated run."""
    from nkbx.parallel import make_mesh, state_shardings
    from nkbx.train import TrainState, build_train_step, get_optimizer
    from nkbx.train.engine import train_epoch
    from nkbx.ops.attention import set_attention_mesh

    mesh = make_mesh(n_data=8)
    model, criterion, Loader = _swin_engine_fixture()
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


def test_grad_accum_with_mesh_and_fused_swin():
    """grad_accum_steps=2 halves the microbatch, so the kernel's per-shard G
    halves too (16-sample batch / 2 microbatches / 8 shards = 1 sample, 4
    windows per shard) — must trace, run, and match the unaccumulated run."""
    from nkbx.parallel import make_mesh
    from nkbx.train import TrainState, build_train_step, get_optimizer
    from nkbx.train.engine import train_epoch
    from nkbx.ops.attention import set_attention_mesh

    mesh = make_mesh(n_data=8)
    model, criterion, Loader = _swin_engine_fixture()
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
