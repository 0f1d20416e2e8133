"""ViT pos_embed resampling on weight load (timm img_size-change semantics).

The reference's pretrained path is ``timm.create_model(name, pretrained=True)``
(reference model.py:75-85); timm resamples the absolute position embedding
bicubically (``resample_abs_pos_embed``: F.interpolate bicubic, antialias=True)
when ``img_size`` differs from the checkpoint's grid. nkbx mirrors that at
weight-load time — a 224-grid converted checkpoint fine-tunes at 384 — in
both ``load_pretrained_into`` (pretrained=True) and ``load_model_variables``
(model.checkpoint warm start). Any OTHER shape mismatch must raise an
informative error instead of surfacing as a broadcast failure inside jit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nkbx.models.convert import (
    adapt_variables_tree,
    load_pretrained_into,
    resample_pos_embed,
    save_params_msgpack,
)
from nkbx.models.vit import ViT

KW = dict(patch_size=8, dim=16, depth=1, n_heads=2, dtype=jnp.float32)


def _backbone_params(module, size):
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    return module.init({"params": jax.random.PRNGKey(0)}, x, train=False)


class TestResampleMath:
    def test_constant_grid_stays_constant_cls_passthrough(self):
        d = 6
        pos = np.concatenate(
            [np.full((1, 1, d), 7.0), np.full((1, 16, d), 3.0)], axis=1)
        out = resample_pos_embed(pos.astype(np.float32), 1 + 36)
        assert out.shape == (1, 37, d)
        np.testing.assert_allclose(out[:, 0], 7.0)  # cls token untouched
        np.testing.assert_allclose(out[:, 1:], 3.0, atol=1e-5)

    def test_downsample_shape_and_prefix0(self):
        out = resample_pos_embed(np.random.randn(1, 36, 4).astype(np.float32), 16)
        assert out.shape == (1, 16, 4)  # prefix 0 (unicom-style, no cls)

    def test_matches_torch_interpolate(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        pos = rng.normal(size=(1, 1 + 49, 8)).astype(np.float32)
        out = resample_pos_embed(pos, 1 + 81)
        ref = F.interpolate(
            torch.from_numpy(pos[:, 1:]).reshape(1, 7, 7, 8).permute(0, 3, 1, 2),
            size=(9, 9), mode="bicubic", antialias=True, align_corners=False,
        ).permute(0, 2, 3, 1).reshape(1, 81, 8).numpy()
        np.testing.assert_allclose(out[:, 1:], ref, rtol=1e-6, atol=1e-6)

    def test_non_square_raises(self):
        with pytest.raises(ValueError, match="square"):
            resample_pos_embed(np.zeros((1, 12, 4), np.float32), 17)

    @pytest.mark.parametrize("g_old,g_new", [(7, 12), (14, 7), (4, 9), (9, 4)])
    def test_numpy_fallback_matches_torch(self, g_old, g_new):
        """The torch-free fallback (_resample_grid_numpy) reimplements the
        same antialiased bicubic filter; must agree to float32 precision."""
        import torch
        import torch.nn.functional as F

        from nkbx.models.convert import _resample_grid_numpy

        rng = np.random.default_rng(3)
        grid = rng.normal(size=(1, g_old, g_old, 8)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(grid).permute(0, 3, 1, 2), size=(g_new, g_new),
            mode="bicubic", antialias=True, align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(_resample_grid_numpy(grid, g_new), ref,
                                   rtol=1e-5, atol=1e-5)

    def test_resample_works_without_torch(self, monkeypatch):
        """A torch-free environment must still load a converted msgpack at a
        new input size (ADVICE r3: load-time resample imported torch)."""
        import sys

        monkeypatch.setitem(sys.modules, "torch", None)  # import torch -> ImportError
        pos = np.random.default_rng(1).normal(size=(1, 1 + 49, 8)).astype(np.float32)
        out = resample_pos_embed(pos, 1 + 81)
        assert out.shape == (1, 82, 8) and np.isfinite(out).all()


class TestLoadPretrainedResample:
    def test_224_style_weights_load_at_larger_size(self, tmp_path):
        vit = ViT(**KW)
        v32 = _backbone_params(vit, 32)   # grid 4x4 -> 17 tokens (cls)
        path = tmp_path / "vit.msgpack"
        save_params_msgpack({"params": v32["params"], "batch_stats": {}}, path)

        v48 = _backbone_params(vit, 48)   # grid 6x6 -> 37 tokens
        variables = {"params": {"backbone": v48["params"], "head": {}},
                     "batch_stats": {}}
        out = load_pretrained_into(variables, path)
        loaded = out["params"]["backbone"]
        assert np.asarray(loaded["pos_embed"]).shape == (1, 37, 16)
        # every other leaf carries the stored values verbatim
        np.testing.assert_array_equal(
            np.asarray(loaded["cls_token"]), np.asarray(v32["params"]["cls_token"]))
        np.testing.assert_array_equal(
            np.asarray(loaded["patch_embed"]["kernel"]),
            np.asarray(v32["params"]["patch_embed"]["kernel"]))
        # and the model runs at the new size with the adapted tree
        y = vit.apply({"params": loaded}, jnp.zeros((2, 48, 48, 3)), train=False)
        assert y.shape == (2, 16) and np.isfinite(np.asarray(y)).all()

    def test_mean_pool_no_cls_resamples(self, tmp_path):
        vit = ViT(pool="mean", **KW)
        v32 = _backbone_params(vit, 32)   # 16 tokens, prefix 0
        path = tmp_path / "vit.msgpack"
        save_params_msgpack({"params": v32["params"], "batch_stats": {}}, path)
        v48 = _backbone_params(vit, 48)
        variables = {"params": {"backbone": v48["params"]}, "batch_stats": {}}
        out = load_pretrained_into(variables, path)
        assert np.asarray(out["params"]["backbone"]["pos_embed"]).shape == (1, 36, 16)

    def test_non_pos_embed_mismatch_raises_with_path(self, tmp_path):
        vit = ViT(**KW)
        v32 = _backbone_params(vit, 32)
        bad = jax.tree_util.tree_map(lambda a: a, dict(v32["params"]))
        bad["patch_embed"] = dict(bad["patch_embed"])
        bad["patch_embed"]["kernel"] = np.zeros((3, 3, 3, 16), np.float32)
        path = tmp_path / "bad.msgpack"
        save_params_msgpack({"params": bad, "batch_stats": {}}, path)
        variables = {"params": {"backbone": v32["params"]}, "batch_stats": {}}
        with pytest.raises(ValueError, match="patch_embed/kernel"):
            load_pretrained_into(variables, path)

    def test_extra_and_missing_keys_raise(self):
        with pytest.raises(ValueError, match="missing"):
            adapt_variables_tree({"a": np.zeros(2)},
                                 {"a": np.zeros(2), "b": np.zeros(2)})
        with pytest.raises(ValueError, match="no slot"):
            adapt_variables_tree({"a": np.zeros(2), "b": np.zeros(2)},
                                 {"a": np.zeros(2)})


class TestCheckpointWarmStartResample:
    def test_load_model_variables_msgpack_resamples(self, tmp_path):
        from nkbx.train.checkpoint import load_model_variables, save_model_msgpack

        vit = ViT(**KW)
        v32 = _backbone_params(vit, 32)
        path = tmp_path / "model.msgpack"
        save_model_msgpack(path, {"params": {"backbone": v32["params"]}})
        v48 = _backbone_params(vit, 48)
        variables = load_model_variables(
            path, {"params": {"backbone": v48["params"]}})
        assert np.asarray(
            variables["params"]["backbone"]["pos_embed"]).shape == (1, 37, 16)
