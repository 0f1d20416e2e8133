"""Torch->Flax weight conversion: synthetic timm-layout state_dict round-trip.

Builds a torch-style ResNet-18 state_dict with the exact timm key layout and
shapes, converts it, loads it into the nkbx model, and checks (a) every leaf
was consumed into the right place and (b) a torch functional re-implementation
of the first stem stage matches the Flax forward — validating layout
transposition, not just tree shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nkbx.models import get_model
from nkbx.models.convert import convert_torch_state_dict, load_pretrained_into, save_params_msgpack


def _synthetic_resnet18_sd(rng):
    """timm resnet18 state_dict layout (keys + OIHW shapes), random values."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2.0, size=c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = [64, 128, 256, 512]
    inc = 64
    for stage, c in enumerate(chans, start=1):
        for b in range(2):
            p = f"layer{stage}.{b}"
            conv(f"{p}.conv1", c, inc if b == 0 else c, 3)
            bn(f"{p}.bn1", c)
            conv(f"{p}.conv2", c, c, 3)
            bn(f"{p}.bn2", c)
            if b == 0 and (c != inc):
                conv(f"{p}.downsample.0", c, inc, 1)
                bn(f"{p}.downsample.1", c)
        inc = c
    sd["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)  # ignored
    sd["fc.bias"] = rng.normal(size=1000).astype(np.float32)
    return sd


class TestResNetConversion:
    @pytest.fixture(scope="class")
    def converted(self, tmp_path_factory):
        rng = np.random.default_rng(0)
        sd = _synthetic_resnet18_sd(rng)
        out = convert_torch_state_dict("resnet18", sd)
        model = get_model({"task": "single", "model": "resnet18", "pretrained": False},
                          ["a", "b"], input_size=(32, 32), dtype=jnp.float32)
        path = tmp_path_factory.mktemp("pt") / "resnet18.msgpack"
        save_params_msgpack(out, path)
        variables = load_pretrained_into(model.variables, path)
        return sd, out, model, variables

    def test_tree_structure_matches(self, converted):
        sd, out, model, variables = converted
        ref = jax.tree_util.tree_structure(model.params["backbone"])
        got = jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.asarray, variables["params"]["backbone"]))
        assert ref == got
        # every torch conv/bn tensor (except fc) must have been consumed
        n_torch = sum(1 for k in sd if not k.startswith("fc.") and "num_batches" not in k)
        n_flax = len(jax.tree_util.tree_leaves(out["params"])) + len(
            jax.tree_util.tree_leaves(out["batch_stats"]))
        assert n_flax == n_torch

    def test_values_transposed_correctly(self, converted):
        sd, out, model, variables = converted
        k = np.asarray(variables["params"]["backbone"]["ConvBN_0"]["Conv_0"]["kernel"])
        np.testing.assert_array_equal(k, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
        s = np.asarray(variables["batch_stats"]["backbone"]["ConvBN_0"]["BatchNorm_0"]["var"])
        np.testing.assert_array_equal(s, sd["bn1.running_var"])

    def test_stem_forward_matches_torch(self, converted):
        import torch
        import torch.nn.functional as F

        sd, out, model, variables = converted
        x = np.random.default_rng(1).normal(size=(2, 3, 33, 33)).astype(np.float32)

        # torch stem: conv7x7 s2 pad3 -> bn(eval) -> relu
        with torch.no_grad():
            t = F.conv2d(torch.tensor(x), torch.tensor(sd["conv1.weight"]), stride=2, padding=3)
            t = F.batch_norm(t, torch.tensor(sd["bn1.running_mean"]),
                             torch.tensor(sd["bn1.running_var"]),
                             torch.tensor(sd["bn1.weight"]), torch.tensor(sd["bn1.bias"]),
                             training=False, eps=1e-5)
            t = F.relu(t).numpy()

        from nkbx.models.common import ConvBN

        stem = ConvBN(64, 7, 2, dtype=jnp.float32)
        vs = {
            "params": variables["params"]["backbone"]["ConvBN_0"],
            "batch_stats": variables["batch_stats"]["backbone"]["ConvBN_0"],
        }
        f = stem.apply(vs, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), False)
        f = np.transpose(np.asarray(f), (0, 3, 1, 2))
        np.testing.assert_allclose(f, t, atol=2e-4)

    def test_tiered_stem_conversion(self):
        rng = np.random.default_rng(2)
        sd = {}

        def conv(name, o, i, k):
            sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)

        def bn(name, c):
            for suffix, v in [("weight", rng.normal(size=c)), ("bias", rng.normal(size=c)),
                              ("running_mean", rng.normal(size=c)),
                              ("running_var", rng.uniform(0.5, 2, c))]:
                sd[f"{name}.{suffix}"] = v.astype(np.float32)

        conv("conv1.0", 24, 3, 3); bn("conv1.1", 24)
        conv("conv1.3", 32, 24, 3); bn("conv1.4", 32)
        conv("conv1.6", 64, 32, 3); bn("bn1", 64)
        # one bottleneck block per stage
        inc = 64
        for stage, c in enumerate([64, 128, 256, 512], start=1):
            p = f"layer{stage}.0"
            conv(f"{p}.conv1", c, inc, 1); bn(f"{p}.bn1", c)
            conv(f"{p}.conv2", c, c, 3); bn(f"{p}.bn2", c)
            conv(f"{p}.conv3", c * 4, c, 1); bn(f"{p}.bn3", c * 4)
            conv(f"{p}.downsample.0", c * 4, inc, 1); bn(f"{p}.downsample.1", c * 4)
            inc = c * 4
        out = convert_torch_state_dict("resnet14t", sd)
        assert "ConvBN_2" in out["params"]  # tiered stem
        assert "Bottleneck_0" in out["params"]
        assert out["params"]["Bottleneck_3"]["ConvBN_2"]["Conv_0"]["kernel"].shape == (1, 1, 512, 2048)

    def test_unknown_family_raises(self):
        with pytest.raises(NotImplementedError):
            convert_torch_state_dict("convnext_tiny", {})


def _synthetic_mbv3_large_sd(rng):
    """timm mobilenetv3_large_100 state_dict layout with correct shapes,
    derived from the same spec table as the nkbx model."""
    from nkbx.models.mobilenetv3 import _LARGE_SPEC, _make_divisible

    sd = {}

    def conv(name, o, i, k, bias=False):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.normal(size=o).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2, c).astype(np.float32)

    conv("conv_stem", 16, 3, 3)
    bn("bn1", 16)
    stage_blocks = [1, 2, 3, 4, 2, 3]
    spec = iter(_LARGE_SPEC)
    inc = 16
    for s, n in enumerate(stage_blocks):
        for b in range(n):
            k, e, o, se, a, st = next(spec)
            t = f"blocks.{s}.{b}"
            if e == inc:  # depthwise separable
                conv(f"{t}.conv_dw", e, 1, k)
                bn(f"{t}.bn1", e)
                conv(f"{t}.conv_pw", o, e, 1)
                bn(f"{t}.bn2", o)
            else:
                conv(f"{t}.conv_pw", e, inc, 1)
                bn(f"{t}.bn1", e)
                conv(f"{t}.conv_dw", e, 1, k)
                bn(f"{t}.bn2", e)
                conv(f"{t}.conv_pwl", o, e, 1)
                bn(f"{t}.bn3", o)
            if se:
                red = _make_divisible(e // 4)
                conv(f"{t}.se.conv_reduce", red, e, 1, bias=True)
                conv(f"{t}.se.conv_expand", e, red, 1, bias=True)
            inc = o
    conv("blocks.6.0.conv", 960, inc, 1)
    bn("blocks.6.0.bn1", 960)
    conv("conv_head", 1280, 960, 1, bias=True)
    return sd


class TestMobileNetV3Conversion:
    def test_tree_structure_and_load(self, tmp_path):
        rng = np.random.default_rng(5)
        sd = _synthetic_mbv3_large_sd(rng)
        out = convert_torch_state_dict("mobilenetv3_large_100", sd)
        model = get_model({"task": "single", "model": "mobilenetv3_large_100",
                           "pretrained": False}, ["a", "b"],
                          input_size=(32, 32), dtype=jnp.float32)
        ref = jax.tree_util.tree_structure(model.params["backbone"])
        got = jax.tree_util.tree_structure(out["params"])
        assert ref == got
        ref_bs = jax.tree_util.tree_structure(model.variables["batch_stats"]["backbone"])
        assert ref_bs == jax.tree_util.tree_structure(out["batch_stats"])
        # dw conv kernel converted to HWIO with I=1
        k = out["params"]["InvertedResidual_3"]["ConvBN_1"]["Conv_0"]["kernel"]
        assert k.shape[2] == 1  # depthwise
        # conv_head became the Dense
        np.testing.assert_array_equal(
            out["params"]["Dense_0"]["kernel"],
            np.transpose(sd["conv_head.weight"][:, :, 0, 0], (1, 0)))
        # shapes all match model init
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(model.params["backbone"]),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(
                jax.tree_util.tree_map(jnp.asarray, out["params"])), key=lambda t: str(t[0])),
        ):
            assert a.shape == b.shape, (pa, a.shape, b.shape)
