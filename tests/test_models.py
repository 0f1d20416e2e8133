"""Model layer: registry, heads, init strategies, freeze labels, dropout.

Big backbone families compile for minutes on this 1-core CPU host, so shape
checks use the tiny ResNet; full-family forward passes are covered on TPU by
bench/verify runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nkbx.models import (
    create_backbone,
    get_model,
    is_backbone_param,
    list_backbones,
    param_labels,
)

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'



class TestRegistry:
    def test_reference_model_names_resolve(self):
        # every backbone name used by reference configs must resolve
        for name in ["resnet14t", "mobilenetv3_large_100", "efficientnet_b2",
                     "convnext_base", "unicom ViT-B/32"]:
            m = create_backbone(name)
            assert m.num_features > 0

    def test_unknown_name_raises(self):
        with pytest.raises(NotImplementedError):
            create_backbone("resnext9000")
        with pytest.raises(NotImplementedError):
            create_backbone("unicom ViT-Z/1")

    def test_unknown_name_suggests_nearest(self):
        """The supported-set contract (MIGRATING.md): a near-miss timm name
        errors loudly WITH the nearest supported name suggested."""
        with pytest.raises(NotImplementedError, match="resnet50"):
            create_backbone("resnet_50")  # typo'd separator
        with pytest.raises(NotImplementedError, match="Did you mean"):
            create_backbone("convnext_tinny")

    def test_list_backbones(self):
        names = list_backbones()
        assert "resnet50" in names and "unicom ViT-B/32" in names

    def test_pretrained_without_checkpoint_warns(self):
        with pytest.warns(UserWarning, match="pretrained"):
            create_backbone("resnet_tiny_test", pretrained=True)

    def test_num_features(self):
        assert create_backbone("resnet18").num_features == 512
        assert create_backbone("resnet50").num_features == 2048
        assert create_backbone("resnet14t").num_features == 2048
        assert create_backbone("mobilenetv3_large_100").num_features == 1280
        assert create_backbone("efficientnet_b0").num_features == 1280
        assert create_backbone("convnext_tiny").num_features == 768
        assert create_backbone("vit_base_patch32_224").num_features == 768
        assert create_backbone("unicom ViT-B/32").num_features == 512
        assert create_backbone("resnext50_32x4d").num_features == 2048
        assert create_backbone("wide_resnet50_2").num_features == 2048
        assert create_backbone("seresnet50").num_features == 2048
        assert create_backbone("efficientnet_b4").num_features == 1792
        assert create_backbone("convnext_large").num_features == 1536
        assert create_backbone("convnext_xlarge").num_features == 2048
        assert create_backbone("vit_large_patch16_224").num_features == 1024
        assert create_backbone("deit_base_patch16_224").num_features == 768
        assert create_backbone("efficientnet_b5").num_features == 2048
        assert create_backbone("efficientnet_b7").num_features == 2560
        assert create_backbone("efficientnetv2_l").num_features == 1280

    def test_every_registry_name_initializes(self):
        """Abstract init (eval_shape: no FLOPs) of EVERY registry backbone:
        constructor args are coherent and the embedding dim is positive."""
        for name in list_backbones():
            module = create_backbone(name)
            # ViT/Swin need the real input size (pos-embed grid / window
            # divisibility); CNNs init fine at 32
            if "_384" in name:
                size = 384
            elif "vit" in name.lower() or "swin" in name:
                size = 224
            else:
                size = 32
            variables = jax.eval_shape(
                lambda m=module, s=size: m.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)), train=False))
            assert "params" in variables, name
            assert module.num_features > 0, name


class TestClassifier:
    @pytest.fixture(scope="class")
    def single(self):
        return get_model({"task": "single", "model": "resnet_tiny_test", "pretrained": False,
                          "classifier_dropout": 0.5},
                         ["a", "b", "c"], input_size=(32, 32), dtype=jnp.float32)

    def test_param_partition(self, single):
        labels = param_labels(single.params)
        flat = jax.tree_util.tree_leaves(labels)
        assert "backbone" in flat and "classifier" in flat
        # the head Dense has exactly kernel+bias in the classifier group
        assert flat.count("classifier") == 2

    def test_head_bias_zero_init(self, single):
        head = single.params["head"]
        assert (np.asarray(head["bias"]) == 0).all()
        assert np.asarray(head["kernel"]).std() > 0

    def test_dropout_active_only_in_train(self, single):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32))
        e1 = single(x)
        e2 = single(x)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))  # eval deterministic
        r1, _ = single.apply(single.variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        r2, _ = single.apply(single.variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(r1), np.asarray(r2))  # dropout varies

    def test_init_strategies(self):
        outs = {}
        for strat in ["kaiming_normal_", "kaiming_uniform_", "xavier_normal_", "xavier_uniform_"]:
            m = get_model({"task": "single", "model": "resnet_tiny_test", "pretrained": False,
                           "classifier_initialization": strat}, ["a", "b"],
                          input_size=(32, 32), dtype=jnp.float32)
            k = np.asarray(m.params["head"]["kernel"])
            outs[strat] = k.std()
        # kaiming variance 2/fan_in vs xavier 2/(fan_in+fan_out): kaiming is larger
        assert outs["kaiming_normal_"] > outs["xavier_normal_"]

    def test_multitask_heads(self):
        m = get_model({"task": "multi", "model": "resnet_tiny_test", "pretrained": False},
                      {"color": ["r", "g", "b"], "size": ["s", "l"]},
                      input_size=(32, 32), dtype=jnp.float32)
        out = m(jnp.zeros((2, 32, 32, 3)))
        assert out["color"].shape == (2, 3) and out["size"].shape == (2, 2)
        labels = jax.tree_util.tree_leaves(param_labels(m.params))
        assert labels.count("classifier") == 4  # two heads x (kernel, bias)

    def test_batchnorm_stats_update_in_train(self, single):
        x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 32, 32, 3)).astype(np.float32))
        _, new_bs = single.apply(single.variables, x, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
        old = jax.tree_util.tree_leaves(single.batch_stats)
        new = jax.tree_util.tree_leaves(new_bs)
        assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new))


class TestResNetR3Options:
    """Round-3 perf hooks: input_norm folding and remat_stages must be exact
    reparametrizations (same function, same gradients, same param paths)."""

    def _setup(self):
        from nkbx.models.resnet import BasicBlock, ResNet

        rng = np.random.default_rng(0)
        x_raw = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3)).astype(np.float32))
        mean = np.array([0.485, 0.456, 0.406], np.float32) * 255
        std = np.array([0.229, 0.224, 0.225], np.float32) * 255
        base = ResNet(stage_sizes=(1, 1), block_cls=BasicBlock, stem_width=16,
                      dtype=jnp.float32)
        v = base.init({"params": jax.random.PRNGKey(0)}, (x_raw - mean) / std,
                      train=False)
        return ResNet, BasicBlock, base, v, x_raw, mean, std

    def test_input_norm_fold_exact_incl_borders(self):
        ResNet, BasicBlock, base, v, x_raw, mean, std = self._setup()
        fold = ResNet(stage_sizes=(1, 1), block_cls=BasicBlock, stem_width=16,
                      dtype=jnp.float32, input_norm=(mean, std))
        y0 = base.apply(v, (x_raw - mean) / std, train=False)
        y1 = fold.apply(v, x_raw, train=False)
        # exact reparametrization incl. the zero-padding border correction
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=2e-5)

    def test_remat_stages_same_params_outputs_grads(self):
        ResNet, BasicBlock, base, v, x_raw, mean, std = self._setup()
        x = (x_raw - mean) / std
        remat = ResNet(stage_sizes=(1, 1), block_cls=BasicBlock, stem_width=16,
                       dtype=jnp.float32, remat_stages=(0, 1))
        # identical param tree paths (checkpoint-compatible)
        vr = remat.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(v)
        np.testing.assert_array_equal(
            np.asarray(remat.apply(v, x, train=False)),
            np.asarray(base.apply(v, x, train=False)))

        def loss(m):
            def f(p):
                out, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                                 x, train=True, mutable=["batch_stats"])
                return jnp.sum(out ** 2)
            return jax.grad(f)(v["params"])

        g0, g1 = loss(base), loss(remat)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_input_norm_requires_s2d(self):
        from nkbx.models.resnet import BasicBlock, ResNet

        m = ResNet(stage_sizes=(1, 1), block_cls=BasicBlock, stem_width=16,
                   s2d_stem=False, input_norm=(np.zeros(3), np.ones(3)))
        with pytest.raises(ValueError, match="s2d"):
            m.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 3)), train=False)


class TestConvNeXtRematOption:
    """Round-3 perf hook: ConvNeXt remat_stages must be an exact
    reparametrization (same function, same gradients, same param paths)."""

    def test_remat_stages_same_params_outputs_grads(self):
        from nkbx.models.convnext import ConvNeXt

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        base = ConvNeXt(depths=(1, 1), dims=(16, 32), dtype=jnp.float32)
        remat = ConvNeXt(depths=(1, 1), dims=(16, 32), dtype=jnp.float32,
                         remat_stages=(0, 1))
        v = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        # identical param tree paths (checkpoint-compatible)
        vr = remat.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(v)
        np.testing.assert_array_equal(
            np.asarray(remat.apply(v, x, train=False)),
            np.asarray(base.apply(v, x, train=False)))

        def grads(m):
            def f(p):
                return jnp.sum(m.apply({"params": p}, x, train=True) ** 2)
            return jax.grad(f)(v["params"])

        g0, g1 = grads(base), grads(remat)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestDenseNetBufferConcatOption:
    """Round-5 attack artifact: buffer_concat must be an exact
    reparametrization (same params, outputs, grads, BN stats). It measured
    -43% on TPU (experiments/r5_densenet_buffer.py, PERF.md r5) — kept as a
    tested conclusion; the concatenate default is the fast path."""

    def test_buffer_concat_same_params_outputs_grads_stats(self):
        from nkbx.models.densenet import DenseNet

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        base = DenseNet(block_config=(2, 2), dtype=jnp.float32)
        buff = DenseNet(block_config=(2, 2), dtype=jnp.float32,
                        buffer_concat=True)
        v = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        vb = buff.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert jax.tree_util.tree_structure(vb) == jax.tree_util.tree_structure(v)
        np.testing.assert_array_equal(
            np.asarray(buff.apply(v, x, train=False)),
            np.asarray(base.apply(v, x, train=False)))

        def run(m):
            def f(p):
                y, mut = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                                 x, train=True, mutable=["batch_stats"])
                return jnp.sum(y ** 2), mut["batch_stats"]

            (loss, stats), g = jax.value_and_grad(f, has_aux=True)(v["params"])
            return loss, stats, g

        l0, s0, g0 = run(base)
        l1, s1, g1 = run(buff)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s0), jax.tree_util.tree_leaves(s1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
