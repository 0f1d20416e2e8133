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

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'



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
        from nkbx.models.convert import s2d_conv1_weight

        sd, out, model, variables = converted
        k = np.asarray(variables["params"]["backbone"]["ConvBN_0"]["Conv_0"]["kernel"])
        np.testing.assert_array_equal(
            k, s2d_conv1_weight(np.transpose(sd["conv1.weight"], (2, 3, 1, 0))))
        k2 = np.asarray(variables["params"]["backbone"]["BasicBlock_0"]["ConvBN_0"]["Conv_0"]["kernel"])
        np.testing.assert_array_equal(k2, np.transpose(sd["layer1.0.conv1.weight"], (2, 3, 1, 0)))
        s = np.asarray(variables["batch_stats"]["backbone"]["ConvBN_0"]["BatchNorm_0"]["var"])
        np.testing.assert_array_equal(s, sd["bn1.running_var"])

    def test_stem_forward_matches_torch(self, converted):
        import torch
        import torch.nn.functional as F

        sd, out, model, variables = converted
        x = np.random.default_rng(1).normal(size=(2, 3, 34, 34)).astype(np.float32)

        # torch stem: conv7x7 s2 pad3 -> bn(eval) -> relu
        with torch.no_grad():
            t = F.conv2d(torch.tensor(x), torch.tensor(sd["conv1.weight"]), stride=2, padding=3)
            t = F.batch_norm(t, torch.tensor(sd["bn1.running_mean"]),
                             torch.tensor(sd["bn1.running_var"]),
                             torch.tensor(sd["bn1.weight"]), torch.tensor(sd["bn1.bias"]),
                             training=False, eps=1e-5)
            t = F.relu(t).numpy()

        from nkbx.models.common import ConvBN
        from nkbx.models.resnet import space_to_depth

        stem = ConvBN(64, 4, 1, padding=((2, 1), (2, 1)), dtype=jnp.float32)
        vs = {
            "params": variables["params"]["backbone"]["ConvBN_0"],
            "batch_stats": variables["batch_stats"]["backbone"]["ConvBN_0"],
        }
        xs = space_to_depth(jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), 2)
        f = stem.apply(vs, xs, False)
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
            convert_torch_state_dict("regnety_064", {})


def _synthetic_mbv3_large_sd(rng):
    """timm mobilenetv3_large_100 state_dict layout with correct shapes,
    derived from the same spec table as the nkbx model."""
    from nkbx.models.mobilenetv3 import _LARGE_SPEC
    from nkbx.models.common import make_divisible as _make_divisible

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


def _synthetic_vit_sd(rng, dim=64, depth=2, n_heads=4, patch=8, n_tokens=17):
    sd = {}
    sd["cls_token"] = rng.normal(size=(1, 1, dim)).astype(np.float32) * 0.02
    sd["pos_embed"] = rng.normal(size=(1, n_tokens, dim)).astype(np.float32) * 0.02
    sd["patch_embed.proj.weight"] = rng.normal(size=(dim, 3, patch, patch)).astype(np.float32) * 0.05
    sd["patch_embed.proj.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
    for i in range(depth):
        t = f"blocks.{i}"
        for ln in ("norm1", "norm2"):
            sd[f"{t}.{ln}.weight"] = rng.uniform(0.8, 1.2, dim).astype(np.float32)
            sd[f"{t}.{ln}.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
        sd[f"{t}.attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32) * 0.05
        sd[f"{t}.attn.qkv.bias"] = rng.normal(size=3 * dim).astype(np.float32) * 0.02
        sd[f"{t}.attn.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32) * 0.05
        sd[f"{t}.attn.proj.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
        sd[f"{t}.mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32) * 0.05
        sd[f"{t}.mlp.fc1.bias"] = rng.normal(size=4 * dim).astype(np.float32) * 0.02
        sd[f"{t}.mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32) * 0.05
        sd[f"{t}.mlp.fc2.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
    sd["norm.weight"] = rng.uniform(0.8, 1.2, dim).astype(np.float32)
    sd["norm.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
    return sd


def _torch_vit_forward(sd, x_nchw, dim, depth, n_heads, patch):
    """timm-ViT forward in torch functional ops (pre-LN, exact GELU, cls pool)."""
    import torch
    import torch.nn.functional as F

    hd = dim // n_heads
    with torch.no_grad():
        x = torch.tensor(x_nchw)
        t = F.conv2d(x, torch.tensor(sd["patch_embed.proj.weight"]),
                     torch.tensor(sd["patch_embed.proj.bias"]), stride=patch)
        b, d, gh, gw = t.shape
        t = t.flatten(2).transpose(1, 2)  # (B, N, D)
        cls = torch.tensor(sd["cls_token"]).expand(b, -1, -1)
        t = torch.cat([cls, t], dim=1) + torch.tensor(sd["pos_embed"])
        for i in range(depth):
            p = f"blocks.{i}"
            y = F.layer_norm(t, (dim,), torch.tensor(sd[f"{p}.norm1.weight"]),
                             torch.tensor(sd[f"{p}.norm1.bias"]), eps=1e-6)
            qkv = F.linear(y, torch.tensor(sd[f"{p}.attn.qkv.weight"]),
                           torch.tensor(sd[f"{p}.attn.qkv.bias"]))
            n = t.shape[1]
            qkv = qkv.reshape(b, n, 3, n_heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
            attn = attn.softmax(dim=-1)
            y = (attn @ v).transpose(1, 2).reshape(b, n, dim)
            y = F.linear(y, torch.tensor(sd[f"{p}.attn.proj.weight"]),
                         torch.tensor(sd[f"{p}.attn.proj.bias"]))
            t = t + y
            y = F.layer_norm(t, (dim,), torch.tensor(sd[f"{p}.norm2.weight"]),
                             torch.tensor(sd[f"{p}.norm2.bias"]), eps=1e-6)
            y = F.linear(y, torch.tensor(sd[f"{p}.mlp.fc1.weight"]), torch.tensor(sd[f"{p}.mlp.fc1.bias"]))
            y = F.gelu(y)
            y = F.linear(y, torch.tensor(sd[f"{p}.mlp.fc2.weight"]), torch.tensor(sd[f"{p}.mlp.fc2.bias"]))
            t = t + y
        t = F.layer_norm(t, (dim,), torch.tensor(sd["norm.weight"]), torch.tensor(sd["norm.bias"]), eps=1e-6)
        return t[:, 0].numpy()  # cls pooled embedding


class TestViTConversion:
    def test_full_forward_matches_torch(self):
        """Converted weights + nkbx ViT == timm-style torch functional forward."""
        from nkbx.models.convert import convert_vit_state_dict
        from nkbx.models.vit import ViT

        dim, depth, n_heads, patch = 64, 2, 4, 8
        rng = np.random.default_rng(7)
        sd = _synthetic_vit_sd(rng, dim, depth, n_heads, patch, n_tokens=17)
        params, _ = convert_vit_state_dict(sd, dim, depth, n_heads)

        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        ref = _torch_vit_forward(sd, x, dim, depth, n_heads, patch)

        module = ViT(patch_size=patch, dim=dim, depth=depth, n_heads=n_heads, dtype=jnp.float32)
        ours = module.apply({"params": params}, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), False)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)

    def test_registered_in_factory(self):
        from nkbx.models.convert import _VIT_SPECS

        assert "vit_base_patch32_224" in _VIT_SPECS


class TestEfficientNetConversion:
    def test_tree_structure(self):
        from nkbx.models.convert import convert_efficientnet_state_dict, _EFFNET_STAGES
        from nkbx.models.efficientnet import _B0_SPEC, _round_channels

        rng = np.random.default_rng(9)
        sd = {}

        def conv(name, o, i, k, bias=False):
            sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)
            if bias:
                sd[f"{name}.bias"] = rng.normal(size=o).astype(np.float32)

        def bn(name, c):
            for sfx, v in [("weight", rng.normal(size=c)), ("bias", rng.normal(size=c)),
                           ("running_mean", rng.normal(size=c)), ("running_var", rng.uniform(0.5, 2, c))]:
                sd[f"{name}.{sfx}"] = v.astype(np.float32)

        conv("conv_stem", 32, 3, 3)
        bn("bn1", 32)
        inc = 32
        for s, (expand, k, stride, repeats, out) in enumerate(_B0_SPEC):
            for b in range(repeats):
                t = f"blocks.{s}.{b}"
                mid = inc * expand
                if expand == 1:
                    conv(f"{t}.conv_dw", mid, 1, k)
                    bn(f"{t}.bn1", mid)
                    conv(f"{t}.conv_pw", out, mid, 1)
                    bn(f"{t}.bn2", out)
                else:
                    conv(f"{t}.conv_pw", mid, inc, 1)
                    bn(f"{t}.bn1", mid)
                    conv(f"{t}.conv_dw", mid, 1, k)
                    bn(f"{t}.bn2", mid)
                    conv(f"{t}.conv_pwl", out, mid, 1)
                    bn(f"{t}.bn3", out)
                red = max(1, int(inc * 0.25))
                conv(f"{t}.se.conv_reduce", red, mid, 1, bias=True)
                conv(f"{t}.se.conv_expand", mid, red, 1, bias=True)
                inc = out
        conv("conv_head", 1280, inc, 1)
        bn("bn2", 1280)

        out_tree = convert_efficientnet_state_dict(sd, _EFFNET_STAGES["efficientnet_b0"])
        model = get_model({"task": "single", "model": "efficientnet_b0", "pretrained": False},
                          ["a", "b"], input_size=(32, 32), dtype=jnp.float32)
        assert (jax.tree_util.tree_structure(model.params["backbone"]) ==
                jax.tree_util.tree_structure(out_tree[0] if isinstance(out_tree, tuple) else out_tree["params"]))
        got = out_tree["params"] if isinstance(out_tree, dict) else out_tree[0]
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(model.params["backbone"]), key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(jax.tree_util.tree_map(jnp.asarray, got)), key=lambda t: str(t[0])),
        ):
            assert a.shape == b.shape, (pa, a.shape, b.shape)


class TestConvNeXtConversion:
    def test_block_forward_matches_torch(self):
        """One converted ConvNeXt block == torch functional reference."""
        import torch
        import torch.nn.functional as F

        from nkbx.models.convert import convert_convnext_state_dict
        from nkbx.models.convnext import ConvNeXtBlock

        dim = 32
        rng = np.random.default_rng(11)
        sd = {}
        sd["stem.0.weight"] = rng.normal(size=(dim, 3, 4, 4)).astype(np.float32) * 0.05
        sd["stem.0.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
        sd["stem.1.weight"] = rng.uniform(0.8, 1.2, dim).astype(np.float32)
        sd["stem.1.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
        t = "stages.0.blocks.0"
        sd[f"{t}.conv_dw.weight"] = rng.normal(size=(dim, 1, 7, 7)).astype(np.float32) * 0.05
        sd[f"{t}.conv_dw.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
        sd[f"{t}.norm.weight"] = rng.uniform(0.8, 1.2, dim).astype(np.float32)
        sd[f"{t}.norm.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
        sd[f"{t}.mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32) * 0.05
        sd[f"{t}.mlp.fc1.bias"] = rng.normal(size=4 * dim).astype(np.float32) * 0.02
        sd[f"{t}.mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32) * 0.05
        sd[f"{t}.mlp.fc2.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
        sd[f"{t}.gamma"] = rng.uniform(0.01, 0.1, dim).astype(np.float32)
        sd["head.norm.weight"] = np.ones(dim, np.float32)
        sd["head.norm.bias"] = np.zeros(dim, np.float32)

        params, _ = convert_convnext_state_dict(sd, depths=(1,))
        blk_params = params["ConvNeXtBlock_0"]

        x = rng.normal(size=(2, dim, 16, 16)).astype(np.float32)
        with torch.no_grad():
            tx = torch.tensor(x)
            y = F.conv2d(tx, torch.tensor(sd[f"{t}.conv_dw.weight"]),
                         torch.tensor(sd[f"{t}.conv_dw.bias"]), padding=3, groups=dim)
            y = y.permute(0, 2, 3, 1)
            y = F.layer_norm(y, (dim,), torch.tensor(sd[f"{t}.norm.weight"]),
                             torch.tensor(sd[f"{t}.norm.bias"]), eps=1e-6)
            y = F.linear(y, torch.tensor(sd[f"{t}.mlp.fc1.weight"]), torch.tensor(sd[f"{t}.mlp.fc1.bias"]))
            y = F.gelu(y)
            y = F.linear(y, torch.tensor(sd[f"{t}.mlp.fc2.weight"]), torch.tensor(sd[f"{t}.mlp.fc2.bias"]))
            y = y * torch.tensor(sd[f"{t}.gamma"])
            ref = (tx.permute(0, 2, 3, 1) + y).numpy()

        blk = ConvNeXtBlock(dim, dtype=jnp.float32)
        ours = blk.apply({"params": blk_params}, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), False)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    def test_full_tree_structure(self):
        from nkbx.models.convert import convert_torch_state_dict

        rng = np.random.default_rng(12)
        depths, dims = (3, 3, 9, 3), (96, 192, 384, 768)
        sd = {}

        def ln(name, c):
            sd[f"{name}.weight"] = rng.normal(size=c).astype(np.float32)
            sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)

        sd["stem.0.weight"] = rng.normal(size=(dims[0], 3, 4, 4)).astype(np.float32)
        sd["stem.0.bias"] = rng.normal(size=dims[0]).astype(np.float32)
        ln("stem.1", dims[0])
        for s, (depth, dim) in enumerate(zip(depths, dims)):
            if s > 0:
                ln(f"stages.{s}.downsample.0", dims[s - 1])
                sd[f"stages.{s}.downsample.1.weight"] = rng.normal(size=(dim, dims[s - 1], 2, 2)).astype(np.float32)
                sd[f"stages.{s}.downsample.1.bias"] = rng.normal(size=dim).astype(np.float32)
            for b in range(depth):
                t = f"stages.{s}.blocks.{b}"
                sd[f"{t}.conv_dw.weight"] = rng.normal(size=(dim, 1, 7, 7)).astype(np.float32)
                sd[f"{t}.conv_dw.bias"] = rng.normal(size=dim).astype(np.float32)
                ln(f"{t}.norm", dim)
                sd[f"{t}.mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32)
                sd[f"{t}.mlp.fc1.bias"] = rng.normal(size=4 * dim).astype(np.float32)
                sd[f"{t}.mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32)
                sd[f"{t}.mlp.fc2.bias"] = rng.normal(size=dim).astype(np.float32)
                sd[f"{t}.gamma"] = rng.normal(size=dim).astype(np.float32)
        ln("norm", dims[-1])  # old-style head norm name

        out = convert_torch_state_dict("convnext_tiny", sd)
        model = get_model({"task": "single", "model": "convnext_tiny", "pretrained": False},
                          ["a", "b"], input_size=(32, 32), dtype=jnp.float32)
        assert (jax.tree_util.tree_structure(model.params["backbone"]) ==
                jax.tree_util.tree_structure(out["params"]))


# ---------------------------------------------------------------------------
# unicom VisionTransformer (reference model.py:77-79 unicom.load path)
# ---------------------------------------------------------------------------


def _synthetic_unicom_sd(rng, dim=64, depth=2, n_heads=4, patch=8, n_tokens=16, emb=32):
    sd = {}
    sd["pos_embed"] = rng.normal(size=(1, n_tokens, dim)).astype(np.float32) * 0.02
    sd["patch_embed.proj.weight"] = rng.normal(size=(dim, 3, patch, patch)).astype(np.float32) * 0.05
    sd["patch_embed.proj.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
    for i in range(depth):
        t = f"blocks.{i}"
        for ln in ("norm1", "norm2"):
            sd[f"{t}.{ln}.weight"] = rng.uniform(0.8, 1.2, dim).astype(np.float32)
            sd[f"{t}.{ln}.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
        sd[f"{t}.attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32) * 0.05
        sd[f"{t}.attn.qkv.bias"] = rng.normal(size=3 * dim).astype(np.float32) * 0.02
        sd[f"{t}.attn.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32) * 0.05
        sd[f"{t}.attn.proj.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
        sd[f"{t}.mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32) * 0.05
        sd[f"{t}.mlp.fc1.bias"] = rng.normal(size=4 * dim).astype(np.float32) * 0.02
        sd[f"{t}.mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32) * 0.05
        sd[f"{t}.mlp.fc2.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
    sd["norm.weight"] = rng.uniform(0.8, 1.2, dim).astype(np.float32)
    sd["norm.bias"] = rng.normal(size=dim).astype(np.float32) * 0.02
    # feature head: Linear(N*dim->dim, no bias) -> BN1d -> Linear(dim->emb, no bias) -> BN1d
    sd["feature.0.weight"] = rng.normal(size=(dim, n_tokens * dim)).astype(np.float32) * 0.02
    sd["feature.2.weight"] = rng.normal(size=(emb, dim)).astype(np.float32) * 0.05
    for bn, width in (("feature.1", dim), ("feature.3", emb)):
        sd[f"{bn}.weight"] = rng.uniform(0.8, 1.2, width).astype(np.float32)
        sd[f"{bn}.bias"] = rng.normal(size=width).astype(np.float32) * 0.02
        sd[f"{bn}.running_mean"] = rng.normal(size=width).astype(np.float32) * 0.1
        sd[f"{bn}.running_var"] = rng.uniform(0.5, 1.5, width).astype(np.float32)
    return sd


def _torch_unicom_forward(sd, x_nchw, dim, depth, n_heads, patch):
    """unicom VisionTransformer forward in torch functional ops: no cls token,
    pre-LN blocks (torch-default LN eps 1e-5), final norm, flatten ALL tokens,
    Linear->BN1d->Linear->BN1d feature head (BN eval, eps 2e-5)."""
    import torch
    import torch.nn.functional as F

    hd = dim // n_heads
    with torch.no_grad():
        x = torch.tensor(x_nchw)
        t = F.conv2d(x, torch.tensor(sd["patch_embed.proj.weight"]),
                     torch.tensor(sd["patch_embed.proj.bias"]), stride=patch)
        b = t.shape[0]
        t = t.flatten(2).transpose(1, 2) + torch.tensor(sd["pos_embed"])
        for i in range(depth):
            p = f"blocks.{i}"
            y = F.layer_norm(t, (dim,), torch.tensor(sd[f"{p}.norm1.weight"]),
                             torch.tensor(sd[f"{p}.norm1.bias"]), eps=1e-5)
            qkv = F.linear(y, torch.tensor(sd[f"{p}.attn.qkv.weight"]),
                           torch.tensor(sd[f"{p}.attn.qkv.bias"]))
            n = t.shape[1]
            qkv = qkv.reshape(b, n, 3, n_heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = ((q @ k.transpose(-2, -1)) * hd ** -0.5).softmax(dim=-1)
            y = (attn @ v).transpose(1, 2).reshape(b, n, dim)
            y = F.linear(y, torch.tensor(sd[f"{p}.attn.proj.weight"]),
                         torch.tensor(sd[f"{p}.attn.proj.bias"]))
            t = t + y
            y = F.layer_norm(t, (dim,), torch.tensor(sd[f"{p}.norm2.weight"]),
                             torch.tensor(sd[f"{p}.norm2.bias"]), eps=1e-5)
            y = F.linear(y, torch.tensor(sd[f"{p}.mlp.fc1.weight"]), torch.tensor(sd[f"{p}.mlp.fc1.bias"]))
            y = F.gelu(y)
            y = F.linear(y, torch.tensor(sd[f"{p}.mlp.fc2.weight"]), torch.tensor(sd[f"{p}.mlp.fc2.bias"]))
            t = t + y
        t = F.layer_norm(t, (dim,), torch.tensor(sd["norm.weight"]), torch.tensor(sd["norm.bias"]), eps=1e-5)
        t = t.reshape(b, -1)
        t = F.linear(t, torch.tensor(sd["feature.0.weight"]))
        t = F.batch_norm(t, torch.tensor(sd["feature.1.running_mean"]),
                         torch.tensor(sd["feature.1.running_var"]),
                         torch.tensor(sd["feature.1.weight"]),
                         torch.tensor(sd["feature.1.bias"]), eps=2e-5)
        t = F.linear(t, torch.tensor(sd["feature.2.weight"]))
        t = F.batch_norm(t, torch.tensor(sd["feature.3.running_mean"]),
                         torch.tensor(sd["feature.3.running_var"]),
                         torch.tensor(sd["feature.3.weight"]),
                         torch.tensor(sd["feature.3.bias"]), eps=2e-5)
        return t.numpy()


class TestUnicomConversion:
    def test_forward_matches_torch(self):
        from nkbx.models.convert import convert_unicom_state_dict
        from nkbx.models.vit import UnicomViT

        dim, depth, n_heads, patch, emb = 64, 2, 4, 8, 32
        rng = np.random.default_rng(11)
        sd = _synthetic_unicom_sd(rng, dim, depth, n_heads, patch, n_tokens=16, emb=emb)
        params, stats = convert_unicom_state_dict(sd, dim, depth, n_heads)

        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        ref = _torch_unicom_forward(sd, x, dim, depth, n_heads, patch)

        module = UnicomViT(patch_size=patch, dim=dim, depth=depth, n_heads=n_heads,
                           embedding_size=emb, input_size=32, dtype=jnp.float32)
        ours = module.apply({"params": params, "batch_stats": stats},
                            jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), train=False)
        assert ours.shape == ref.shape == (2, emb)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4)

    def test_all_tensors_consumed(self):
        from nkbx.models.convert import convert_torch_state_dict

        rng = np.random.default_rng(3)
        sd = _synthetic_unicom_sd(rng, dim=768, depth=12, n_heads=12, patch=32,
                                  n_tokens=49, emb=512)
        out = convert_torch_state_dict("unicom ViT-B/32", sd)

        import jax
        n_flax = len(jax.tree_util.tree_leaves(out))
        # fused qkv weight+bias (2 tensors/block) split into q/k/v kernel+bias
        # (6 tensors/block): +4 per block, everything else 1:1
        assert n_flax == len(sd) + 4 * 12

    def test_convert_name_dispatch_shapes_match_model(self):
        """Converted tree must load into a real UnicomViT init (names + shapes)."""
        import jax

        from nkbx.models.convert import convert_torch_state_dict
        from nkbx.models.registry import create_backbone

        rng = np.random.default_rng(5)
        sd = _synthetic_unicom_sd(rng, dim=768, depth=12, n_heads=12, patch=32,
                                  n_tokens=49, emb=512)
        out = convert_torch_state_dict("unicom ViT-B/32", sd)
        module = create_backbone("unicom ViT-B/32", dtype=jnp.float32)
        variables = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
        )

        def paths(tree):
            return {jax.tree_util.keystr(p): v.shape
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}

        def norm(d):
            return {k: tuple(v) for k, v in d.items()}

        assert norm(paths(out["params"])) == norm(paths(variables["params"]))
        assert norm(paths(out["batch_stats"])) == norm(paths(variables["batch_stats"]))


class TestS2DStemEquivalence:
    def test_full_model_matches_plain_stem(self):
        """ResNet with the space-to-depth stem == the plain 7x7/s2 stem, same
        torch weights (exact reparametrization, nkbx/models/resnet.py)."""
        from nkbx.models.convert import convert_resnet_state_dict
        from nkbx.models.resnet import resnet18

        rng = np.random.default_rng(4)
        sd = _synthetic_resnet18_sd(rng)
        # scale down: synthetic unit-normal weights explode activations
        sd = {k: v * 0.1 if k.endswith("weight") and v.ndim == 4 else v
              for k, v in sd.items()}

        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

        outs = []
        for s2d in (True, False):
            params, stats = convert_resnet_state_dict(sd, (2, 2, 2, 2), s2d_stem=s2d)
            module = resnet18(dtype=jnp.float32, s2d_stem=s2d)
            outs.append(np.asarray(module.apply(
                {"params": params, "batch_stats": stats}, x, train=False)))
        # synthetic unit-scale weights drive activations to ~1e4, so float
        # noise can flip relu-boundary elements: tolerance scales with the
        # activation magnitude (exactness at sane scales is covered by the
        # stem-forward test above and the numerically verified reparam)
        scale = np.abs(outs[1]).max()
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-3, atol=1e-4 * scale)

    def test_odd_input_raises(self):
        from nkbx.models.resnet import resnet_tiny_test

        module = resnet_tiny_test(dtype=jnp.float32)
        with pytest.raises(ValueError, match="even input"):
            module.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 33, 3)), train=False)


def _synthetic_bottleneck_sd(rng, stage_sizes, cardinality=1, base_width=64,
                             se_ratio=0.0):
    """timm Bottleneck-ResNet state_dict layout (resnet50/resnext/seresnet):
    width = floor(planes*base_width/64)*cardinality, grouped conv2, optional
    SEModule fc1/fc2 1x1 convs with bias."""
    sd = {}

    def conv(name, o, i, k, groups=1):
        sd[f"{name}.weight"] = (
            rng.normal(size=(o, i // groups, k, k)).astype(np.float32) * 0.1)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2.0, size=c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    inc = 64
    for stage, n in enumerate(stage_sizes, start=1):
        planes = 64 * 2 ** (stage - 1)
        out = planes * 4
        width = int(planes * base_width / 64) * cardinality
        for b in range(n):
            p = f"layer{stage}.{b}"
            conv(f"{p}.conv1", width, inc, 1)
            bn(f"{p}.bn1", width)
            conv(f"{p}.conv2", width, width, 3, groups=cardinality)
            bn(f"{p}.bn2", width)
            conv(f"{p}.conv3", out, width, 1)
            bn(f"{p}.bn3", out)
            if se_ratio > 0:
                rd = int(out * se_ratio)
                sd[f"{p}.se.fc1.weight"] = rng.normal(size=(rd, out, 1, 1)).astype(np.float32)
                sd[f"{p}.se.fc1.bias"] = rng.normal(size=rd).astype(np.float32)
                sd[f"{p}.se.fc2.weight"] = rng.normal(size=(out, rd, 1, 1)).astype(np.float32)
                sd[f"{p}.se.fc2.bias"] = rng.normal(size=out).astype(np.float32)
            if b == 0 and inc != out:
                conv(f"{p}.downsample.0", out, inc, 1)
                bn(f"{p}.downsample.1", out)
            inc = out
    return sd


def _torch_bottleneck_forward(sd, x, stage_sizes, cardinality, se_ratio):
    """timm Bottleneck-ResNet eval forward (timm resnet.py Bottleneck.forward
    order: conv1/bn1/relu, grouped conv2/bn2/relu, conv3/bn3, SE, add, relu)."""
    import torch
    import torch.nn.functional as F

    def bn(t, p):
        return F.batch_norm(
            t, torch.tensor(sd[f"{p}.running_mean"]), torch.tensor(sd[f"{p}.running_var"]),
            torch.tensor(sd[f"{p}.weight"]), torch.tensor(sd[f"{p}.bias"]),
            training=False, eps=1e-5)

    with torch.no_grad():
        t = F.conv2d(torch.tensor(x), torch.tensor(sd["conv1.weight"]), stride=2, padding=3)
        t = F.relu(bn(t, "bn1"))
        t = F.max_pool2d(t, 3, 2, 1)
        for stage, n in enumerate(stage_sizes, start=1):
            for b in range(n):
                p = f"layer{stage}.{b}"
                stride = 2 if stage > 1 and b == 0 else 1
                r = t
                y = F.relu(bn(F.conv2d(t, torch.tensor(sd[f"{p}.conv1.weight"])), f"{p}.bn1"))
                y = F.relu(bn(F.conv2d(y, torch.tensor(sd[f"{p}.conv2.weight"]),
                                       stride=stride, padding=1, groups=cardinality), f"{p}.bn2"))
                y = bn(F.conv2d(y, torch.tensor(sd[f"{p}.conv3.weight"])), f"{p}.bn3")
                if se_ratio > 0:
                    s = y.mean((2, 3), keepdim=True)
                    s = F.relu(F.conv2d(s, torch.tensor(sd[f"{p}.se.fc1.weight"]),
                                        torch.tensor(sd[f"{p}.se.fc1.bias"])))
                    s = torch.sigmoid(F.conv2d(s, torch.tensor(sd[f"{p}.se.fc2.weight"]),
                                               torch.tensor(sd[f"{p}.se.fc2.bias"])))
                    y = y * s
                if f"{p}.downsample.0.weight" in sd:
                    r = bn(F.conv2d(t, torch.tensor(sd[f"{p}.downsample.0.weight"]),
                                    stride=stride), f"{p}.downsample.1")
                t = F.relu(y + r)
        return t.mean((2, 3)).numpy()


class TestResNextSEConversion:
    """ResNeXt / SE-ResNet / wide variants: grouped convs + SEModule parity."""

    def test_full_forward_matches_torch(self):
        from nkbx.models.convert import convert_resnet_state_dict
        from nkbx.models.resnet import Bottleneck, ResNet

        rng = np.random.default_rng(11)
        stage_sizes, card, bw, se = (1, 1), 4, 8, 1 / 16
        sd = _synthetic_bottleneck_sd(rng, stage_sizes, card, bw, se)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        ref = _torch_bottleneck_forward(sd, x, stage_sizes, card, se)

        params, stats = convert_resnet_state_dict(sd, stage_sizes)
        module = ResNet(stage_sizes=stage_sizes, block_cls=Bottleneck,
                        cardinality=card, base_width=bw, se_ratio=se,
                        dtype=jnp.float32)
        ours = module.apply({"params": params, "batch_stats": stats},
                            jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), train=False)
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5 * scale)

    @pytest.mark.parametrize("name,card,bw,se", [
        ("resnext50_32x4d", 32, 4, 0.0),
        ("wide_resnet50_2", 1, 128, 0.0),
        ("seresnext50_32x4d", 32, 4, 1 / 16),
    ])
    def test_convert_dispatch_shapes_match_model(self, name, card, bw, se):
        """Converted full-size tree loads into a real init (names + shapes)."""
        from nkbx.models.registry import create_backbone

        rng = np.random.default_rng(12)
        sd = _synthetic_bottleneck_sd(rng, (3, 4, 6, 3), card, bw, se)
        out = convert_torch_state_dict(name, sd)
        module = create_backbone(name, dtype=jnp.float32)
        variables = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False))

        def paths(tree):
            return {jax.tree_util.keystr(p): tuple(v.shape)
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}

        assert paths(out["params"]) == paths(variables["params"])
        assert paths(out["batch_stats"]) == paths(variables["batch_stats"])


def _synthetic_densenet_sd(rng, block_config, growth=8, init_features=16, bn_size=4):
    """torchvision/timm DenseNet state_dict layout, random values."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.2

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2.0, size=c).astype(np.float32)

    conv("features.conv0", init_features, 3, 7)
    bn("features.norm0", init_features)
    c = init_features
    for b, n_layers in enumerate(block_config, start=1):
        for li in range(1, n_layers + 1):
            t = f"features.denseblock{b}.denselayer{li}"
            bn(f"{t}.norm1", c)
            conv(f"{t}.conv1", bn_size * growth, c, 1)
            bn(f"{t}.norm2", bn_size * growth)
            conv(f"{t}.conv2", growth, bn_size * growth, 3)
            c += growth
        if b != len(block_config):
            bn(f"features.transition{b}.norm", c)
            conv(f"features.transition{b}.conv", c // 2, c, 1)
            c //= 2
    bn("features.norm5", c)
    return sd


def _torch_densenet_forward(sd, x, block_config, growth=8, bn_size=4):
    """torchvision densenet.py eval forward (pre-activation dense layers)."""
    import torch
    import torch.nn.functional as F

    def bn(t, p):
        return F.batch_norm(
            t, torch.tensor(sd[f"{p}.running_mean"]), torch.tensor(sd[f"{p}.running_var"]),
            torch.tensor(sd[f"{p}.weight"]), torch.tensor(sd[f"{p}.bias"]),
            training=False, eps=1e-5)

    with torch.no_grad():
        t = F.conv2d(torch.tensor(x), torch.tensor(sd["features.conv0.weight"]),
                     stride=2, padding=3)
        t = F.relu(bn(t, "features.norm0"))
        t = F.max_pool2d(t, 3, 2, 1)
        for b, n_layers in enumerate(block_config, start=1):
            for li in range(1, n_layers + 1):
                p = f"features.denseblock{b}.denselayer{li}"
                y = F.conv2d(F.relu(bn(t, f"{p}.norm1")), torch.tensor(sd[f"{p}.conv1.weight"]))
                y = F.conv2d(F.relu(bn(y, f"{p}.norm2")), torch.tensor(sd[f"{p}.conv2.weight"]),
                             padding=1)
                t = torch.cat([t, y], dim=1)
            if b != len(block_config):
                p = f"features.transition{b}"
                t = F.conv2d(F.relu(bn(t, f"{p}.norm")), torch.tensor(sd[f"{p}.conv.weight"]))
                t = F.avg_pool2d(t, 2, 2)
        t = F.relu(bn(t, "features.norm5"))
        return t.mean((2, 3)).numpy()


class TestDenseNetConversion:
    def test_full_forward_matches_torch(self):
        from nkbx.models.convert import convert_densenet_state_dict
        from nkbx.models.densenet import DenseNet

        rng = np.random.default_rng(13)
        block_config = (2, 2)
        sd = _synthetic_densenet_sd(rng, block_config)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        ref = _torch_densenet_forward(sd, x, block_config)

        params, stats = convert_densenet_state_dict(sd, block_config)
        module = DenseNet(block_config=block_config, growth_rate=8,
                          init_features=16, dtype=jnp.float32)
        ours = module.apply({"params": params, "batch_stats": stats},
                            jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), train=False)
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5 * scale)

    def test_convert_dispatch_shapes_match_model(self):
        from nkbx.models.registry import create_backbone

        rng = np.random.default_rng(14)
        sd = _synthetic_densenet_sd(rng, (6, 12, 24, 16), growth=32, init_features=64)
        out = convert_torch_state_dict("densenet121", sd)
        module = create_backbone("densenet121", dtype=jnp.float32)
        assert module.num_features == 1024
        variables = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False))

        def paths(tree):
            return {jax.tree_util.keystr(p): tuple(v.shape)
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}

        assert paths(out["params"]) == paths(variables["params"])
        assert paths(out["batch_stats"]) == paths(variables["batch_stats"])
        # every torch tensor consumed (no classifier keys in the synthetic sd)
        n_flax = len(jax.tree_util.tree_leaves(out["params"])) + len(
            jax.tree_util.tree_leaves(out["batch_stats"]))
        assert n_flax == len(sd)


class TestEfficientNetV2Conversion:
    TINY = (("fused", 1, 3, 1, 1, 8, 0.0),
            ("fused", 4, 3, 2, 1, 16, 0.0),
            ("mb", 4, 3, 2, 1, 24, 0.25))

    @staticmethod
    def _synthetic_sd(rng, spec, stem=8):
        sd = {}

        def conv(name, o, i, k, groups=1, bias=False):
            sd[f"{name}.weight"] = (
                rng.normal(size=(o, i // groups, k, k)).astype(np.float32) * 0.2)
            if bias:
                sd[f"{name}.bias"] = rng.normal(size=o).astype(np.float32)

        def bn(name, c):
            sd[f"{name}.weight"] = rng.normal(size=c).astype(np.float32)
            sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)
            sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
            sd[f"{name}.running_var"] = rng.uniform(0.5, 2.0, size=c).astype(np.float32)

        conv("conv_stem", stem, 3, 3)
        bn("bn1", stem)
        inc = stem
        for s, (block, e, k, _stride, repeats, out, se) in enumerate(spec):
            for b in range(repeats):
                t = f"blocks.{s}.{b}"
                mid = inc * e
                if block == "fused" and e == 1:
                    conv(f"{t}.conv", out, inc, k)
                    bn(f"{t}.bn1", out)
                elif block == "fused":
                    conv(f"{t}.conv_exp", mid, inc, k)
                    bn(f"{t}.bn1", mid)
                    conv(f"{t}.conv_pwl", out, mid, 1)
                    bn(f"{t}.bn2", out)
                else:
                    conv(f"{t}.conv_pw", mid, inc, 1)
                    bn(f"{t}.bn1", mid)
                    conv(f"{t}.conv_dw", mid, mid, 3, groups=mid)
                    bn(f"{t}.bn2", mid)
                    rd = max(1, int(inc * se))
                    conv(f"{t}.se.conv_reduce", rd, mid, 1, bias=True)
                    conv(f"{t}.se.conv_expand", mid, rd, 1, bias=True)
                    conv(f"{t}.conv_pwl", out, mid, 1)
                    bn(f"{t}.bn3", out)
                inc = out
        conv("conv_head", 1280, inc, 1)
        bn("bn2", 1280)
        return sd

    @staticmethod
    def _torch_forward(sd, x, spec):
        """timm efficientnet-builder eval forward: silu everywhere, SE inner
        act silu + sigmoid gate, projection BNs act-free, skip on s1 e-in==out."""
        import torch
        import torch.nn.functional as F

        def bn(t, p):
            return F.batch_norm(
                t, torch.tensor(sd[f"{p}.running_mean"]), torch.tensor(sd[f"{p}.running_var"]),
                torch.tensor(sd[f"{p}.weight"]), torch.tensor(sd[f"{p}.bias"]),
                training=False, eps=1e-5)

        def cv(t, p, stride=1, padding=0, groups=1, bias=False):
            return F.conv2d(t, torch.tensor(sd[f"{p}.weight"]),
                            torch.tensor(sd[f"{p}.bias"]) if bias else None,
                            stride=stride, padding=padding, groups=groups)

        with torch.no_grad():
            t = F.silu(bn(cv(torch.tensor(x), "conv_stem", 2, 1), "bn1"))
            for s, (block, e, k, stride, repeats, out, se) in enumerate(spec):
                for b in range(repeats):
                    p = f"blocks.{s}.{b}"
                    st = stride if b == 0 else 1
                    inc = t.shape[1]
                    r = t
                    if block == "fused" and e == 1:
                        y = F.silu(bn(cv(t, f"{p}.conv", st, k // 2), f"{p}.bn1"))
                    elif block == "fused":
                        y = F.silu(bn(cv(t, f"{p}.conv_exp", st, k // 2), f"{p}.bn1"))
                        y = bn(cv(y, f"{p}.conv_pwl"), f"{p}.bn2")
                    else:
                        y = F.silu(bn(cv(t, f"{p}.conv_pw"), f"{p}.bn1"))
                        y = F.silu(bn(cv(y, f"{p}.conv_dw", st, 1, groups=y.shape[1]), f"{p}.bn2"))
                        g = y.mean((2, 3), keepdim=True)
                        g = F.silu(cv(g, f"{p}.se.conv_reduce", bias=True))
                        g = torch.sigmoid(cv(g, f"{p}.se.conv_expand", bias=True))
                        y = y * g
                        y = bn(cv(y, f"{p}.conv_pwl"), f"{p}.bn3")
                    t = (y + r) if (st == 1 and inc == out) else y
            t = F.silu(bn(cv(t, "conv_head"), "bn2"))
            return t.mean((2, 3)).numpy()

    def test_full_forward_matches_torch(self):
        from nkbx.models.convert import convert_efficientnetv2_state_dict
        from nkbx.models.efficientnet import EfficientNetV2

        rng = np.random.default_rng(15)
        sd = self._synthetic_sd(rng, self.TINY)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        ref = self._torch_forward(sd, x, self.TINY)

        params, stats = convert_efficientnetv2_state_dict(sd, self.TINY)
        module = EfficientNetV2(spec=self.TINY, stem_width=8, dtype=jnp.float32)
        ours = module.apply({"params": params, "batch_stats": stats},
                            jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), train=False)
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5 * scale)

    def test_convert_dispatch_shapes_match_model(self):
        from nkbx.models.efficientnet import V2_S_SPEC
        from nkbx.models.registry import create_backbone

        rng = np.random.default_rng(16)
        sd = self._synthetic_sd(rng, V2_S_SPEC, stem=24)
        out = convert_torch_state_dict("efficientnetv2_s", sd)
        module = create_backbone("efficientnetv2_s", dtype=jnp.float32)
        variables = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False))

        def paths(tree):
            return {jax.tree_util.keystr(p): tuple(v.shape)
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}

        assert paths(out["params"]) == paths(variables["params"])
        assert paths(out["batch_stats"]) == paths(variables["batch_stats"])
        n_flax = len(jax.tree_util.tree_leaves(out["params"])) + len(
            jax.tree_util.tree_leaves(out["batch_stats"]))
        assert n_flax == len(sd)


def _synthetic_swin_sd(rng, embed, depths, heads, patch=2, window=4):
    """microsoft/original-timm Swin V1 state_dict layout, random values."""
    sd = {}

    def ln(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.8, 1.2, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32) * 0.02

    def dense(name, o, i, bias=True):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = rng.normal(size=o).astype(np.float32) * 0.02

    sd["patch_embed.proj.weight"] = rng.normal(
        size=(embed, 3, patch, patch)).astype(np.float32) * 0.05
    sd["patch_embed.proj.bias"] = rng.normal(size=embed).astype(np.float32) * 0.02
    ln("patch_embed.norm", embed)
    dim = embed
    for i, depth in enumerate(depths):
        h = heads[i]
        for j in range(depth):
            t = f"layers.{i}.blocks.{j}"
            ln(f"{t}.norm1", dim)
            sd[f"{t}.attn.relative_position_bias_table"] = rng.normal(
                size=((2 * window - 1) ** 2, h)).astype(np.float32) * 0.05
            dense(f"{t}.attn.qkv", 3 * dim, dim)
            dense(f"{t}.attn.proj", dim, dim)
            ln(f"{t}.norm2", dim)
            dense(f"{t}.mlp.fc1", 4 * dim, dim)
            dense(f"{t}.mlp.fc2", dim, 4 * dim)
        if i != len(depths) - 1:
            ln(f"layers.{i}.downsample.norm", 4 * dim)
            dense(f"layers.{i}.downsample.reduction", 2 * dim, 4 * dim, bias=False)
            dim *= 2
    ln("norm", dim)
    return sd


def _torch_swin_forward(sd, x, embed, depths, heads, patch=2, window=4):
    """Independent torch functional re-derivation of the Swin V1 forward
    (microsoft Swin-Transformer models/swin_transformer.py semantics)."""
    import torch
    import torch.nn.functional as F

    from nkbx.models.swin import _relative_position_index, _shift_attn_mask

    def ln(t, p):
        return F.layer_norm(t, (t.shape[-1],), torch.tensor(sd[f"{p}.weight"]),
                            torch.tensor(sd[f"{p}.bias"]), eps=1e-5)

    def lin(t, p, bias=True):
        return F.linear(t, torch.tensor(sd[f"{p}.weight"]),
                        torch.tensor(sd[f"{p}.bias"]) if bias else None)

    with torch.no_grad():
        t = F.conv2d(torch.tensor(x), torch.tensor(sd["patch_embed.proj.weight"]),
                     torch.tensor(sd["patch_embed.proj.bias"]), stride=patch)
        t = t.permute(0, 2, 3, 1)  # B,H,W,C
        t = ln(t, "patch_embed.norm")
        b = t.shape[0]
        dim = embed
        for i, depth in enumerate(depths):
            h = heads[i]
            for j in range(depth):
                p = f"layers.{i}.blocks.{j}"
                hc, wc = t.shape[1], t.shape[2]
                win = min(window, hc, wc)
                shift = (window // 2 if j % 2 else 0) if win < min(hc, wc) else 0
                s = t
                y = ln(t, f"{p}.norm1")
                if shift:
                    y = torch.roll(y, (-shift, -shift), dims=(1, 2))
                yw = y.reshape(b, hc // win, win, wc // win, win, dim)
                yw = yw.permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win, dim)
                n, hd = win * win, dim // h
                qkv = lin(yw, f"{p}.attn.qkv").reshape(-1, n, 3, h, hd).permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
                table = torch.tensor(sd[f"{p}.attn.relative_position_bias_table"])
                idx = torch.tensor(_relative_position_index(win).reshape(-1))
                bias = table[idx].reshape(n, n, h).permute(2, 0, 1)
                attn = attn + bias[None]
                if shift:
                    m = torch.tensor(_shift_attn_mask(hc, wc, win, shift))
                    nw = m.shape[0]
                    attn = attn.view(-1, nw, h, n, n) + m[None, :, None]
                    attn = attn.view(-1, h, n, n)
                attn = attn.softmax(-1)
                yw = (attn @ v).transpose(1, 2).reshape(-1, n, dim)
                yw = lin(yw, f"{p}.attn.proj")
                y = yw.reshape(b, hc // win, wc // win, win, win, dim)
                y = y.permute(0, 1, 3, 2, 4, 5).reshape(b, hc, wc, dim)
                if shift:
                    y = torch.roll(y, (shift, shift), dims=(1, 2))
                t = s + y
                y2 = lin(F.gelu(lin(ln(t, f"{p}.norm2"), f"{p}.mlp.fc1")), f"{p}.mlp.fc2")
                t = t + y2
            if i != len(depths) - 1:
                t = torch.cat([t[:, 0::2, 0::2], t[:, 1::2, 0::2],
                               t[:, 0::2, 1::2], t[:, 1::2, 1::2]], -1)
                t = ln(t, f"layers.{i}.downsample.norm")
                t = lin(t, f"layers.{i}.downsample.reduction", bias=False)
                dim *= 2
        t = ln(t, "norm")
        return t.mean((1, 2)).numpy()


class TestSwinConversion:
    def test_full_forward_matches_torch(self):
        """Converted weights + nkbx Swin == independent torch functional
        forward, including a SHIFTED block with its attention mask and a
        PatchMerging stage."""
        from nkbx.models.convert import convert_swin_state_dict
        from nkbx.models.swin import SwinTransformer

        embed, depths, heads, patch, window = 16, (2, 2), (2, 4), 2, 4
        rng = np.random.default_rng(17)
        sd = _synthetic_swin_sd(rng, embed, depths, heads, patch, window)
        x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
        ref = _torch_swin_forward(sd, x, embed, depths, heads, patch, window)

        params, _ = convert_swin_state_dict(sd, depths)
        module = SwinTransformer(embed_dim=embed, depths=depths, n_heads=heads,
                                 patch_size=patch, window=window, dtype=jnp.float32)
        ours = module.apply({"params": params},
                            jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), train=False)
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5 * scale)

    def test_shifted_block_actually_shifts(self):
        """The test grid (8x8, window 4) must exercise shift=2 in stage 0."""
        from nkbx.models.swin import _shift_attn_mask

        m = _shift_attn_mask(8, 8, 4, 2)
        assert m.shape == (4, 16, 16)
        assert (m < 0).any()

    def test_convert_dispatch_shapes_match_model(self):
        from nkbx.models.registry import create_backbone

        rng = np.random.default_rng(18)
        sd = _synthetic_swin_sd(rng, 96, (2, 2, 6, 2), (3, 6, 12, 24),
                                patch=4, window=7)
        out = convert_torch_state_dict("swin_tiny_patch4_window7_224", sd)
        module = create_backbone("swin_tiny_patch4_window7_224", dtype=jnp.float32)
        assert module.num_features == 768
        variables = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False))

        def paths(tree):
            return {jax.tree_util.keystr(p): tuple(v.shape)
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}

        assert paths(out["params"]) == paths(variables["params"])
        n_flax = len(jax.tree_util.tree_leaves(out["params"]))
        assert n_flax == len(sd)  # no buffers in the synthetic sd; all consumed


class TestSwinTimm09Layout:
    def test_downsample_at_next_stage_index(self):
        """timm >= 0.9 places PatchMerging at the next stage's INPUT
        (layers.{i+1}.downsample); the converter must accept both layouts and
        produce identical trees."""
        from nkbx.models.convert import convert_swin_state_dict

        rng = np.random.default_rng(19)
        sd_orig = _synthetic_swin_sd(rng, 16, (2, 2), (2, 4))
        sd_new = {}
        for k, v in sd_orig.items():
            if k.startswith("layers.0.downsample."):
                k = k.replace("layers.0.downsample.", "layers.1.downsample.")
            sd_new[k] = v
        a, _ = convert_swin_state_dict(sd_orig, (2, 2))
        b, _ = convert_swin_state_dict(sd_new, (2, 2))
        for (pa, va), (pb, vb) in zip(
                jax.tree_util.tree_leaves_with_path(a),
                jax.tree_util.tree_leaves_with_path(b)):
            assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
            np.testing.assert_array_equal(va, vb)


class TestReferenceCheckpointConversion:
    """Full reference-TRAINED classifier (emb_model.* + classifier.*) ->
    nkbx model variables: the torch-user migration path for trained models."""

    def test_singletask_loads_into_model(self, tmp_path):
        from nkbx.models.convert import convert_reference_checkpoint
        from nkbx.train.checkpoint import load_model_variables

        rng = np.random.default_rng(23)
        sd = {f"emb_model.{k}": v for k, v in _synthetic_resnet18_sd(rng).items()
              if not k.startswith("fc.")}
        sd["classifier.1.weight"] = rng.normal(size=(3, 512)).astype(np.float32)
        sd["classifier.1.bias"] = rng.normal(size=3).astype(np.float32)

        out = convert_reference_checkpoint("resnet18", sd)
        model = get_model({"task": "single", "model": "resnet18", "pretrained": False},
                          ["a", "b", "c"], input_size=(32, 32), dtype=jnp.float32)
        path = tmp_path / "ref.msgpack"
        save_params_msgpack(out, path)
        variables = load_model_variables(path, model.variables)
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["head"]["kernel"]),
            sd["classifier.1.weight"].T)
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["backbone"]["BasicBlock_0"]["ConvBN_0"]["Conv_0"]["kernel"]),
            np.transpose(sd["emb_model.layer1.0.conv1.weight"], (2, 3, 1, 0)))
        # the loaded variables actually run
        logits = model.module.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.zeros((1, 32, 32, 3)), train=False)
        assert logits.shape == (1, 3)

    def test_multitask_heads(self):
        from nkbx.models.convert import convert_reference_checkpoint

        rng = np.random.default_rng(24)
        sd = {f"emb_model.{k}": v for k, v in _synthetic_resnet18_sd(rng).items()
              if not k.startswith("fc.")}
        for t, n in (("color", 4), ("shape", 2)):
            sd[f"classifier.{t}.1.weight"] = rng.normal(size=(n, 512)).astype(np.float32)
            sd[f"classifier.{t}.1.bias"] = rng.normal(size=n).astype(np.float32)

        out = convert_reference_checkpoint("resnet18", sd)
        assert set(k for k in out["params"] if k.startswith("head_")) == {
            "head_color", "head_shape"}
        assert out["params"]["head_color"]["kernel"].shape == (512, 4)

        model = get_model(
            {"task": "multi", "model": "resnet18", "pretrained": False},
            {"color": list("abcd"), "shape": list("xy")},
            input_size=(32, 32), dtype=jnp.float32)

        def paths(tree):
            return {jax.tree_util.keystr(p) for p, _ in
                    jax.tree_util.tree_leaves_with_path(tree)}

        assert paths(out["params"]) == paths(model.params)

    def test_not_a_reference_checkpoint_raises(self):
        from nkbx.models.convert import convert_reference_checkpoint

        with pytest.raises(ValueError, match="emb_model"):
            convert_reference_checkpoint("resnet18", {"conv1.weight": np.zeros((64, 3, 7, 7))})


class TestAllRegistryNamesConvert:
    """VERDICT r2 item 6: for EVERY registry backbone name, a torch nn.Module
    replica with the upstream key layout (nkbx/models/torch_ref.py) must
    convert into exactly the nkbx model's param/batch_stats tree (paths AND
    shapes), with every non-classifier tensor consumed."""

    IGNORED = (
        "num_batches_tracked",          # torch BN bookkeeping
        "relative_position_index",      # swin buffer, recomputed by nkbx
        "attn_mask",                    # swin buffer, recomputed by nkbx
        "fc.weight", "fc.bias",         # classifier heads (num_classes=0 drop)
        "classifier.weight", "classifier.bias",
        "head.fc.weight", "head.fc.bias",
        "head.weight", "head.bias",
        "cls_token",                    # consumed, value check skips 0-size fill
    )

    @staticmethod
    def _is_ignored(key):
        return any(key.endswith(sfx) for sfx in TestAllRegistryNamesConvert.IGNORED)

    @pytest.mark.parametrize("name", [
        "resnet_tiny_test", "resnet14t", "resnet18", "resnet18d", "resnet26",
        "resnet34", "resnet34d", "resnet50d",
        "resnet50", "resnet101", "resnet152", "resnext50_32x4d",
        "resnext101_32x8d", "wide_resnet50_2", "seresnet50",
        "seresnext50_32x4d", "mobilenetv3_large_100", "mobilenetv3_small_100",
        "efficientnet_b0", "efficientnet_b1", "efficientnet_b2",
        "efficientnet_b3", "efficientnet_b4", "efficientnet_b5",
        "efficientnet_b6", "efficientnet_b7", "efficientnetv2_s",
        "efficientnetv2_m", "efficientnetv2_l",
        "densenet121", "densenet169", "densenet201",
        "convnext_tiny", "convnext_small", "convnext_base", "convnext_large",
        "convnext_xlarge",
        "vit_tiny_patch16_224", "vit_small_patch16_224",
        "vit_small_patch32_224", "vit_base_patch16_224",
        "vit_base_patch32_224", "vit_large_patch16_224",
        "deit_tiny_patch16_224", "deit_small_patch16_224",
        "deit_base_patch16_224",
        "vit_tiny_patch16_384", "vit_small_patch16_384",
        "vit_small_patch32_384", "vit_base_patch16_384",
        "vit_base_patch32_384", "vit_large_patch16_384",
        "vit_large_patch32_384",
        "unicom ViT-B/32", "unicom ViT-B/16", "unicom ViT-L/14",
        "swin_tiny_patch4_window7_224", "swin_small_patch4_window7_224",
        "swin_base_patch4_window7_224", "swin_large_patch4_window7_224",
        "swin_base_patch4_window12_384", "swin_large_patch4_window12_384",
    ])
    def test_replica_state_dict_converts_exactly(self, name):
        import torch

        from nkbx.models.torch_ref import build_replica
        from nkbx.models.registry import create_backbone

        with torch.no_grad():
            replica = build_replica(name)
            sd = replica.state_dict()
            # unique constant per tensor: value-presence proves consumption
            # even through transposes / qkv splits / s2d regrouping
            consts = {}
            for i, (k, v) in enumerate(sd.items()):
                if v.numel():
                    v.fill_(float(i + 1))
                    consts[k] = float(i + 1)
            sd = {k: v.numpy() for k, v in sd.items()}

        out = convert_torch_state_dict(name, sd)

        module = create_backbone(name, dtype=jnp.float32)
        size = 384 if "_384" in name else 224
        variables = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, size, size, 3)), train=False))

        def paths(tree):
            return {jax.tree_util.keystr(p): tuple(v.shape)
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}

        assert paths(out["params"]) == paths(variables["params"])
        assert paths(out["batch_stats"]) == paths(
            variables.get("batch_stats", {}))

        seen = set()
        for leaf in jax.tree_util.tree_leaves(out):
            seen.update(np.unique(np.asarray(leaf)).tolist())
        missing = [k for k, c in consts.items()
                   if c not in seen and not self._is_ignored(k)]
        assert not missing, f"unconsumed torch tensors: {missing[:8]}"
