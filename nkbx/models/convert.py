"""Torch->Flax pretrained-weight conversion.

The reference gets pretrained backbones from timm/unicom (model.py:75-85), which
ship torch ``state_dict``s. nkbx loads converted Flax param trees from
``$NKBX_PRETRAINED_DIR/<name>.msgpack``; :func:`convert_torch_state_dict` maps a
timm-layout state_dict (numpy arrays; no torch import needed) onto the nkbx
backbone tree. ResNet family implemented; other families follow the same
pattern (tracked in SURVEY.md §7 "Hard parts").

Tensor layout rules:
    conv weight   (O, I, kH, kW) -> (kH, kW, I, O)
    linear weight (O, I)         -> (I, O)
    bn weight/bias/running_mean/running_var -> scale/bias + batch_stats mean/var
"""

from __future__ import annotations


import numpy as np

import flax.serialization


def save_params_msgpack(params, path):
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def _aa_resize_weights(in_size, out_size):
    """Per-output-row weight matrix of torch/PIL antialiased bicubic resize
    (the `_upsample_bicubic2d_aa` scheme: cubic kernel a=-0.5, support scaled
    by max(in/out, 1), weights renormalized per output pixel)."""
    scale = in_size / out_size
    kscale = max(scale, 1.0)
    support = 2.0 * kscale
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        t = np.abs((np.arange(lo, hi) - center + 0.5) / kscale)
        a = -0.5
        w = np.where(
            t <= 1.0, ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
            np.where(t < 2.0, ((a * t - 5.0 * a) * t + 8.0 * a) * t - 4.0 * a, 0.0))
        W[i, lo:hi] = w / w.sum()
    return W


def _resample_grid_numpy(grid, g_new):
    """(1, g, g, D) -> (1, g_new, g_new, D) antialiased-bicubic, numpy-only.

    Matches torch ``F.interpolate(mode="bicubic", antialias=True,
    align_corners=False)`` to float32 precision (asserted in
    tests/test_convert.py) so a torch-free environment can still load a
    converted msgpack at a different input size.
    """
    g_old = grid.shape[1]
    W = _aa_resize_weights(g_old, g_new)
    out = np.einsum("oi,bihd->bohd", W, grid.astype(np.float64))
    out = np.einsum("oi,bhid->bhod", W, out)
    return out.astype(np.float32)


def resample_pos_embed(stored, n_new):
    """Bicubically resample a ViT absolute position embedding to a new token
    count — timm ``resample_abs_pos_embed`` semantics (F.interpolate bicubic,
    antialias=True, align_corners=False; prefix/cls tokens pass through), so
    224-grid pretrained weights fine-tune at any square input size exactly as
    ``timm.create_model(name, img_size=...)`` would produce.

    Uses torch when importable (bit-identical to timm's own path); otherwise a
    numpy reimplementation of the same antialiased filter (float32-equivalent,
    parity-tested) — load-time resampling must not require torch in a
    torch-free training environment.

    ``stored`` is (1, n_old, D); returns (1, n_new, D) float32. Both grids
    must be square (the prefix length — 1 for cls-token ViTs, 0 for unicom —
    is inferred as the one making BOTH token counts perfect squares).
    """
    import math

    stored = np.asarray(stored, dtype=np.float32)
    _, n_old, d = stored.shape
    for prefix in (1, 0):
        g_old = math.isqrt(max(n_old - prefix, 0))
        g_new = math.isqrt(max(n_new - prefix, 0))
        if g_old ** 2 == n_old - prefix and g_new ** 2 == n_new - prefix:
            break
    else:
        raise ValueError(
            f"cannot resample pos_embed from {n_old} to {n_new} tokens: no "
            f"prefix length makes both grids square (non-square input sizes "
            f"are not supported for pretrained ViT resampling)")
    grid = stored[:, prefix:].reshape(1, g_old, g_old, d)
    try:
        import torch
        import torch.nn.functional as F
    except ImportError:
        grid = _resample_grid_numpy(grid, g_new)
    else:
        grid = torch.from_numpy(grid.copy()).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, size=(g_new, g_new), mode="bicubic",
                             antialias=True, align_corners=False)
        grid = grid.permute(0, 2, 3, 1).numpy()
    grid = grid.reshape(1, g_new * g_new, d)
    return np.concatenate([stored[:, :prefix], grid], axis=1)


def adapt_variables_tree(loaded, target, where=()):
    """Fit a restored weight tree onto a model's template tree.

    Shape-equal leaves pass through untouched (no device transfer — only
    ``.shape`` is read from the template, which may hold device arrays behind
    a slow link). A ``pos_embed`` whose token count differs is resampled via
    :func:`resample_pos_embed` (the timm img_size-change behavior, reference
    model.py:75-85's ``timm.create_model``). Any other mismatch raises an
    informative error — without this, flax's ``from_state_dict``/orbax graft
    mismatched arrays silently and the failure surfaces later as an opaque
    broadcast error deep inside the jitted step.
    """
    from collections.abc import Mapping

    if isinstance(target, Mapping):
        if not isinstance(loaded, Mapping):
            raise ValueError(
                f"checkpoint structure mismatch at {'/'.join(where) or '<root>'}: "
                f"model expects a subtree, checkpoint holds a leaf")
        missing = [k for k in target if k not in loaded]
        if missing:
            raise ValueError(
                f"checkpoint is missing {'/'.join(where + (str(missing[0]),))} "
                f"(and {len(missing) - 1} more) — was it saved from a "
                f"different architecture?")
        extra = [k for k in loaded if k not in target]
        if extra:
            raise ValueError(
                f"checkpoint holds {'/'.join(where + (str(extra[0]),))} "
                f"(and {len(extra) - 1} more) the model has no slot for — "
                f"wrong backbone name for these weights?")
        return {k: adapt_variables_tree(loaded[k], target[k], where + (k,))
                for k in target}
    lshape = tuple(getattr(loaded, "shape", ()))
    tshape = tuple(getattr(target, "shape", ()))
    if lshape == tshape:
        return loaded
    if (where and where[-1] == "pos_embed" and len(lshape) == 3
            and len(tshape) == 3 and lshape[0] == tshape[0] == 1
            and lshape[2] == tshape[2]):
        return resample_pos_embed(loaded, tshape[1])
    raise ValueError(
        f"shape mismatch at {'/'.join(where)}: checkpoint holds {lshape}, "
        f"model expects {tshape}. The checkpoint was made for a different "
        f"input size or architecture variant (only ViT pos_embed token "
        f"counts are adapted automatically; e.g. a unicom feature head is "
        f"bound to its training input size).")


def load_pretrained_into(variables, path):
    """Load a converted backbone param tree into a model's variables.

    The msgpack stores {'params': {...}, 'batch_stats': {...}} for the BACKBONE
    subtree only; the classifier head keeps its fresh init (matching the
    reference, where timm weights cover the backbone and the head is new).
    A ViT ``pos_embed`` converted at the 224 grid is bicubically resampled to
    the model's grid when ``input_size`` differs (timm img_size semantics).
    """
    target = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables.get("batch_stats", {}).get("backbone", {}),
    }
    # restore RAW (no template): the adapter below does the structural
    # validation, so a pos_embed token-count difference reaches it instead of
    # being rejected (or silently grafted) by from_state_dict
    with open(path, "rb") as f:
        loaded = flax.serialization.msgpack_restore(f.read())
    if not loaded.get("batch_stats"):
        loaded = dict(loaded)
        loaded["batch_stats"] = {}
    loaded = adapt_variables_tree(loaded, target)
    variables = dict(variables)
    variables["params"] = dict(variables["params"])
    variables["params"]["backbone"] = loaded["params"]
    if loaded.get("batch_stats"):
        bs = dict(variables.get("batch_stats", {}))
        bs["backbone"] = loaded["batch_stats"]
        variables["batch_stats"] = bs
    return variables


# ---------------------------------------------------------------------------
# timm state_dict -> nkbx backbone tree
# ---------------------------------------------------------------------------


def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def s2d_conv1_weight(w_hwio):
    """Regroup a (7,7,C,O) stem kernel for the space-to-depth stem: zero-pad to
    8x8 at offset (1,1), split each spatial dim into (tap, parity) and fold the
    2x2 parity into channels -> (4,4,4C,O). Exactly reproduces conv7x7/s2 pad 3
    as conv4x4/s1 pad (2,1) over the space_to_depth(2) input (nkbx ResNet
    ``s2d_stem``)."""
    w = np.asarray(w_hwio)
    kh, kw, c, o = w.shape
    assert kh == 7 and kw == 7, f"s2d stem expects a 7x7 kernel, got {w.shape}"
    wp = np.zeros((8, 8, c, o), w.dtype)
    wp[1:8, 1:8] = w
    return wp.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, o)


def s2d_conv1_weight_inverse(w2):
    """(4,4,4C,O) s2d stem kernel -> the equivalent (7,7,C,O) conv kernel
    (drops the masked dead row/column; inverse of :func:`s2d_conv1_weight`)."""
    w2 = np.asarray(w2)
    _, _, cc, o = w2.shape
    c = cc // 4
    wp = w2.reshape(4, 4, 2, 2, c, o).transpose(0, 2, 1, 3, 4, 5).reshape(8, 8, c, o)
    return wp[1:8, 1:8]


def convert_resnet_state_dict(state_dict, stage_sizes, tiered_stem=False,
                              s2d_stem=True):
    """timm ResNet state_dict -> (params, batch_stats) for nkbx ResNet.

    Handles the default 7x7 stem (regrouped for the space-to-depth stem unless
    ``s2d_stem=False``) and the tiered 3x conv stem (timm *t models: conv1 is a
    Sequential of conv/bn/act x3 with the last bn named ``bn1``). Blocks are
    flat-numbered in nkbx (BasicBlock_k / Bottleneck_k across stages) matching
    timm's layer{L}.{B} in order.
    """
    params: dict = {}
    stats: dict = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    is_bottleneck = any(".conv3.weight" in k for k in sd)
    block_name = "Bottleneck" if is_bottleneck else "BasicBlock"

    def put_bn(prefix_torch, path):
        _set(params, path + ("scale",), sd[f"{prefix_torch}.weight"])
        _set(params, path + ("bias",), sd[f"{prefix_torch}.bias"])
        _set(stats, path + ("mean",), sd[f"{prefix_torch}.running_mean"])
        _set(stats, path + ("var",), sd[f"{prefix_torch}.running_var"])

    # stem
    if tiered_stem:
        # timm tiered: conv1.{0,3,6} convs, conv1.{1,4} bns, bn1 is the last bn
        _set(params, ("ConvBN_0", "Conv_0", "kernel"), _conv_w(sd["conv1.0.weight"]))
        put_bn("conv1.1", ("ConvBN_0", "BatchNorm_0"))
        _set(params, ("ConvBN_1", "Conv_0", "kernel"), _conv_w(sd["conv1.3.weight"]))
        put_bn("conv1.4", ("ConvBN_1", "BatchNorm_0"))
        _set(params, ("ConvBN_2", "Conv_0", "kernel"), _conv_w(sd["conv1.6.weight"]))
        put_bn("bn1", ("ConvBN_2", "BatchNorm_0"))
    else:
        w = _conv_w(sd["conv1.weight"])
        if s2d_stem:
            w = s2d_conv1_weight(w)
        _set(params, ("ConvBN_0", "Conv_0", "kernel"), w)
        put_bn("bn1", ("ConvBN_0", "BatchNorm_0"))

    # blocks: layer{L}.{B} -> {block_name}_{k} flat across stages
    k = 0
    n_convs = 3 if is_bottleneck else 2
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for b in range(n_blocks):
            t = f"layer{stage}.{b}"
            f = f"{block_name}_{k}"
            for ci in range(1, n_convs + 1):
                _set(params, (f, f"ConvBN_{ci-1}", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv{ci}.weight"]))
                put_bn(f"{t}.bn{ci}", (f, f"ConvBN_{ci-1}", "BatchNorm_0"))
            if f"{t}.se.fc1.weight" in sd:
                # timm SEModule (seresnet*): fc1/fc2 are 1x1 Conv2d with bias
                for fc in ("fc1", "fc2"):
                    _set(params, (f, "se", fc, "kernel"), _conv_w(sd[f"{t}.se.{fc}.weight"]))
                    _set(params, (f, "se", fc, "bias"), sd[f"{t}.se.{fc}.bias"])
            if f"{t}.downsample.0.weight" in sd:
                _set(params, (f, "downsample", "Conv_0", "kernel"), _conv_w(sd[f"{t}.downsample.0.weight"]))
                put_bn(f"{t}.downsample.1", (f, "downsample", "BatchNorm_0"))
            elif f"{t}.downsample.1.weight" in sd:
                # avg_down ('d' variants): downsample.0 is the param-free
                # AvgPool/Identity, conv at .1, bn at .2
                _set(params, (f, "downsample", "Conv_0", "kernel"), _conv_w(sd[f"{t}.downsample.1.weight"]))
                put_bn(f"{t}.downsample.2", (f, "downsample", "BatchNorm_0"))
            k += 1

    return params, stats


_RESNET_SPECS = {
    "resnet_tiny_test": ((1, 1), False),  # tests-only tiny net (nkbx/models/resnet.py)
    "resnet14t": ((1, 1, 1, 1), True),
    "resnet18": ((2, 2, 2, 2), False),
    # 'd' variants: deep stem shares the tiered conv1.{0,3,6} key layout
    "resnet18d": ((2, 2, 2, 2), True),
    "resnet26": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet34d": ((3, 4, 6, 3), True),
    "resnet50": ((3, 4, 6, 3), False),
    "resnet50d": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), False),
    "resnet152": ((3, 8, 36, 3), False),
    # grouped-conv torch weights are (O, I/groups, H, W) -> HWIO unchanged;
    # SE fc weights handled inside convert_resnet_state_dict
    "resnext50_32x4d": ((3, 4, 6, 3), False),
    "resnext101_32x8d": ((3, 4, 23, 3), False),
    "wide_resnet50_2": ((3, 4, 6, 3), False),
    "seresnet50": ((3, 4, 6, 3), False),
    "seresnext50_32x4d": ((3, 4, 6, 3), False),
}


def convert_torch_state_dict(name: str, state_dict):
    """Convert a timm-layout state_dict (dict of numpy arrays / torch tensors
    with .numpy()) for backbone ``name`` into {'params', 'batch_stats'} ready
    for :func:`save_params_msgpack` / ``$NKBX_PRETRAINED_DIR``.
    """
    state_dict = {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in state_dict.items()
    }
    if name in _RESNET_SPECS:
        stage_sizes, tiered = _RESNET_SPECS[name]
        params, stats = convert_resnet_state_dict(state_dict, stage_sizes, tiered)
        return {"params": params, "batch_stats": stats}
    if name in _MBV3_STAGES:
        params, stats = convert_mobilenetv3_state_dict(state_dict, _MBV3_STAGES[name])
        return {"params": params, "batch_stats": stats}
    if name in _VIT_SPECS:
        dim, depth, n_heads = _VIT_SPECS[name]
        params, stats = convert_vit_state_dict(state_dict, dim, depth, n_heads)
        return {"params": params, "batch_stats": stats}
    if name in _EFFNET_STAGES:
        params, stats = convert_efficientnet_state_dict(state_dict, _EFFNET_STAGES[name])
        return {"params": params, "batch_stats": stats}
    if name in _CONVNEXT_SPECS:
        depths, _dims = _CONVNEXT_SPECS[name]
        params, stats = convert_convnext_state_dict(state_dict, depths)
        return {"params": params, "batch_stats": stats}
    if name in _UNICOM_SPECS:
        dim, depth, n_heads = _UNICOM_SPECS[name]
        params, stats = convert_unicom_state_dict(state_dict, dim, depth, n_heads)
        return {"params": params, "batch_stats": stats}
    if name in _DENSENET_CONFIGS:
        params, stats = convert_densenet_state_dict(state_dict, _DENSENET_CONFIGS[name])
        return {"params": params, "batch_stats": stats}
    if name in _EFFNETV2_SPECS:
        params, stats = convert_efficientnetv2_state_dict(state_dict, _effnetv2_spec(name))
        return {"params": params, "batch_stats": stats}
    if name in _SWIN_SPECS:
        _dim, depths, _heads = _SWIN_SPECS[name]
        params, stats = convert_swin_state_dict(state_dict, depths)
        return {"params": params, "batch_stats": stats}
    supported = (sorted(_RESNET_SPECS) + sorted(_MBV3_STAGES)
                 + sorted(_VIT_SPECS) + sorted(_EFFNET_STAGES)
                 + sorted(_EFFNETV2_SPECS) + sorted(_CONVNEXT_SPECS)
                 + sorted(_UNICOM_SPECS) + sorted(_DENSENET_CONFIGS)
                 + sorted(_SWIN_SPECS))
    raise NotImplementedError(
        f"torch->flax conversion for {name!r} not implemented yet "
        f"(have: {supported})"
    )


# ---------------------------------------------------------------------------
# timm mobilenetv3 -> nkbx MobileNetV3
# ---------------------------------------------------------------------------

# timm mobilenetv3_large_100 / small_100 block counts per stage (efficientnet
# builder layout: blocks.{stage}.{i}; the trailing ConvBnAct stage is separate)
_MBV3_STAGES = {
    "mobilenetv3_large_100": [1, 2, 3, 4, 2, 3],
    "mobilenetv3_small_100": [1, 2, 3, 2, 3],
}


def convert_mobilenetv3_state_dict(state_dict, stage_blocks):
    """timm mobilenetv3 state_dict -> (params, batch_stats) for nkbx MobileNetV3.

    timm layout: conv_stem/bn1; blocks.{s}.{i} where block (0,0) is a
    DepthwiseSeparableConv (conv_dw/bn1, conv_pw/bn2, optional se) and the rest
    are InvertedResiduals (conv_pw/bn1 expand, conv_dw/bn2, optional
    se.conv_reduce/conv_expand, conv_pwl/bn3); blocks.{last}.0 is ConvBnAct
    (conv/bn1); conv_head is the 1x1 -> Dense(1280) with bias.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put_bn(t, path):
        _set(params, path + ("scale",), sd[f"{t}.weight"])
        _set(params, path + ("bias",), sd[f"{t}.bias"])
        _set(stats, path + ("mean",), sd[f"{t}.running_mean"])
        _set(stats, path + ("var",), sd[f"{t}.running_var"])

    _set(params, ("ConvBN_0", "Conv_0", "kernel"), _conv_w(sd["conv_stem.weight"]))
    put_bn("bn1", ("ConvBN_0", "BatchNorm_0"))

    k = 0
    for s, n_blocks in enumerate(stage_blocks):
        for b in range(n_blocks):
            t = f"blocks.{s}.{b}"
            f = f"InvertedResidual_{k}"
            if f"{t}.conv_pwl.weight" in sd:  # full inverted residual
                _set(params, (f, "ConvBN_0", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_pw.weight"]))
                put_bn(f"{t}.bn1", (f, "ConvBN_0", "BatchNorm_0"))
                _set(params, (f, "ConvBN_1", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_dw.weight"]))
                put_bn(f"{t}.bn2", (f, "ConvBN_1", "BatchNorm_0"))
                proj = ("ConvBN_2",)
                proj_src = (f"{t}.conv_pwl.weight", f"{t}.bn3")
            else:  # depthwise-separable first block (no expansion)
                _set(params, (f, "ConvBN_0", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_dw.weight"]))
                put_bn(f"{t}.bn1", (f, "ConvBN_0", "BatchNorm_0"))
                proj = ("ConvBN_1",)
                proj_src = (f"{t}.conv_pw.weight", f"{t}.bn2")
            if f"{t}.se.conv_reduce.weight" in sd:
                _set(params, (f, "SqueezeExcite_0", "Conv_0", "kernel"), _conv_w(sd[f"{t}.se.conv_reduce.weight"]))
                _set(params, (f, "SqueezeExcite_0", "Conv_0", "bias"), sd[f"{t}.se.conv_reduce.bias"])
                _set(params, (f, "SqueezeExcite_0", "Conv_1", "kernel"), _conv_w(sd[f"{t}.se.conv_expand.weight"]))
                _set(params, (f, "SqueezeExcite_0", "Conv_1", "bias"), sd[f"{t}.se.conv_expand.bias"])
            _set(params, (f,) + proj + ("Conv_0", "kernel"), _conv_w(sd[proj_src[0]]))
            put_bn(proj_src[1], (f,) + proj + ("BatchNorm_0",))
            k += 1

    # trailing ConvBnAct stage (blocks.{last}.0.conv / bn1)
    t = f"blocks.{len(stage_blocks)}.0"
    _set(params, ("ConvBN_1", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv.weight"]))
    put_bn(f"{t}.bn1", ("ConvBN_1", "BatchNorm_0"))

    # conv_head 1x1 on pooled features == Dense
    w = sd["conv_head.weight"]  # (O, I, 1, 1)
    _set(params, ("Dense_0", "kernel"), np.transpose(w[:, :, 0, 0], (1, 0)))
    if "conv_head.bias" in sd:
        _set(params, ("Dense_0", "bias"), sd["conv_head.bias"])
    else:
        _set(params, ("Dense_0", "bias"), np.zeros(w.shape[0], np.float32))

    return params, stats


# ---------------------------------------------------------------------------
# timm ViT -> nkbx ViT
# ---------------------------------------------------------------------------

_VIT_SPECS = {
    # name: (dim, depth, n_heads)
    "vit_tiny_patch16_224": (192, 12, 3),
    "vit_small_patch16_224": (384, 12, 6),
    "vit_small_patch32_224": (384, 12, 6),
    "vit_base_patch16_224": (768, 12, 12),
    "vit_base_patch32_224": (768, 12, 12),
    "vit_large_patch16_224": (1024, 24, 16),
    # deit non-distilled names: plain VisionTransformer, vit_* layout
    "deit_tiny_patch16_224": (192, 12, 3),
    "deit_small_patch16_224": (384, 12, 6),
    "deit_base_patch16_224": (768, 12, 12),
    # 384 fine-tune variants: same layout, 576-token pos_embed (the nkbx
    # model builds pos_embed from the actual grid; mismatches resample on
    # load — resample_pos_embed)
    "vit_tiny_patch16_384": (192, 12, 3),
    "vit_small_patch16_384": (384, 12, 6),
    "vit_small_patch32_384": (384, 12, 6),
    "vit_base_patch16_384": (768, 12, 12),
    "vit_base_patch32_384": (768, 12, 12),
    "vit_large_patch16_384": (1024, 24, 16),
    "vit_large_patch32_384": (1024, 24, 16),
}

_UNICOM_SPECS = {
    # unicom.load names (reference model.py:77): (dim, depth, n_heads)
    "unicom ViT-B/32": (768, 12, 12),
    "unicom ViT-B/16": (768, 12, 12),
    "unicom ViT-L/14": (1024, 24, 16),
}


def _put_vit_block(params, sd, t, f, dim, n_heads):
    """Map one torch transformer block (timm/unicom shared key layout:
    norm1, attn.qkv fused, attn.proj, norm2, mlp.fc1/fc2) onto nkbx
    TransformerBlock ``f``. flax attention kernels are (in, heads, head_dim) /
    out (heads, head_dim, in); head ordering in the fused qkv rows is [q; k; v]
    with out index h*head_dim + d (row-major heads-first), matching the flax
    reshape."""
    hd = dim // n_heads
    for ln_t, ln_f in ((f"{t}.norm1", "LayerNorm_0"), (f"{t}.norm2", "LayerNorm_1")):
        _set(params, (f, ln_f, "scale"), sd[f"{ln_t}.weight"])
        _set(params, (f, ln_f, "bias"), sd[f"{ln_t}.bias"])
    qkv_w = sd[f"{t}.attn.qkv.weight"]  # (3*dim, dim)
    qkv_b = sd[f"{t}.attn.qkv.bias"]
    for j, nm in enumerate(("query", "key", "value")):
        w = qkv_w[j * dim:(j + 1) * dim]  # (dim_out, dim_in)
        _set(params, (f, "MultiHeadDotProductAttention_0", nm, "kernel"),
             np.transpose(w, (1, 0)).reshape(dim, n_heads, hd))
        _set(params, (f, "MultiHeadDotProductAttention_0", nm, "bias"),
             qkv_b[j * dim:(j + 1) * dim].reshape(n_heads, hd))
    pw = sd[f"{t}.attn.proj.weight"]  # (dim, dim)
    _set(params, (f, "MultiHeadDotProductAttention_0", "out", "kernel"),
         np.transpose(pw, (1, 0)).reshape(n_heads, hd, dim))
    _set(params, (f, "MultiHeadDotProductAttention_0", "out", "bias"),
         sd[f"{t}.attn.proj.bias"])
    for fc, dn in ((f"{t}.mlp.fc1", "Dense_0"), (f"{t}.mlp.fc2", "Dense_1")):
        _set(params, (f, dn, "kernel"), np.transpose(sd[f"{fc}.weight"], (1, 0)))
        _set(params, (f, dn, "bias"), sd[f"{fc}.bias"])


def convert_vit_state_dict(state_dict, dim, depth, n_heads):
    """timm ViT state_dict -> (params, {}) for nkbx ViT.

    timm layout: cls_token, pos_embed, patch_embed.proj, blocks.{i}.{norm1,
    attn.qkv (fused 3D x D), attn.proj, norm2, mlp.fc1, mlp.fc2}, final norm.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}

    _set(params, ("cls_token",), sd["cls_token"])
    _set(params, ("pos_embed",), sd["pos_embed"])
    _set(params, ("patch_embed", "kernel"), _conv_w(sd["patch_embed.proj.weight"]))
    _set(params, ("patch_embed", "bias"), sd["patch_embed.proj.bias"])

    for i in range(depth):
        _put_vit_block(params, sd, f"blocks.{i}", f"TransformerBlock_{i}", dim, n_heads)

    _set(params, ("LayerNorm_0", "scale"), sd["norm.weight"])
    _set(params, ("LayerNorm_0", "bias"), sd["norm.bias"])
    return params, {}


def convert_unicom_state_dict(state_dict, dim, depth, n_heads):
    """deepglint/unicom VisionTransformer state_dict -> (params, batch_stats)
    for nkbx UnicomViT (the reference's ``unicom.load`` backbone, reference
    model.py:77-79).

    unicom layout (vision_transformer.py of deepglint/unicom): pos_embed (no
    cls token), patch_embed.proj, blocks.{i}.* (same block keys as timm), final
    norm, and the metric-learning ``feature`` Sequential:
    feature.0 = Linear(N*dim -> dim, no bias), feature.1 = BatchNorm1d(dim),
    feature.2 = Linear(dim -> embedding, no bias), feature.3 = BatchNorm1d(emb)
    (``feature[-2].out_features`` is the reference's emb_size).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    _set(params, ("pos_embed",), sd["pos_embed"])
    _set(params, ("patch_embed", "kernel"), _conv_w(sd["patch_embed.proj.weight"]))
    if "patch_embed.proj.bias" in sd:
        _set(params, ("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    else:  # conv without bias: keep flax zeros
        _set(params, ("patch_embed", "bias"), np.zeros(sd["patch_embed.proj.weight"].shape[0], np.float32))

    for i in range(depth):
        _put_vit_block(params, sd, f"blocks.{i}", f"TransformerBlock_{i}", dim, n_heads)

    _set(params, ("norm", "scale"), sd["norm.weight"])
    _set(params, ("norm", "bias"), sd["norm.bias"])

    for fc, bn, f_fc, f_bn in (("feature.0", "feature.1", "feature_fc1", "feature_bn1"),
                               ("feature.2", "feature.3", "feature_fc2", "feature_bn2")):
        _set(params, (f_fc, "kernel"), np.transpose(sd[f"{fc}.weight"], (1, 0)))
        _set(params, (f_bn, "scale"), sd[f"{bn}.weight"])
        _set(params, (f_bn, "bias"), sd[f"{bn}.bias"])
        _set(stats, (f_bn, "mean"), sd[f"{bn}.running_mean"])
        _set(stats, (f_bn, "var"), sd[f"{bn}.running_var"])
    return params, stats


# ---------------------------------------------------------------------------
# timm EfficientNet -> nkbx EfficientNet
# ---------------------------------------------------------------------------

_EFFNET_STAGES = {
    # timm blocks.{s} counts (after depth scaling)
    "efficientnet_b0": [1, 2, 2, 3, 3, 4, 1],
    "efficientnet_b1": [2, 3, 3, 4, 4, 5, 2],
    "efficientnet_b2": [2, 3, 3, 4, 4, 5, 2],
    "efficientnet_b3": [2, 3, 3, 5, 5, 6, 2],
    "efficientnet_b4": [2, 4, 4, 6, 6, 8, 2],
    "efficientnet_b5": [3, 5, 5, 7, 7, 9, 3],
    "efficientnet_b6": [3, 6, 6, 8, 8, 11, 3],
    "efficientnet_b7": [4, 7, 7, 10, 10, 13, 4],
}


def convert_efficientnet_state_dict(state_dict, stage_blocks):
    """timm EfficientNet state_dict -> (params, batch_stats) for nkbx EfficientNet.

    Same efficientnet-builder layout as mobilenetv3 (conv_stem/bn1, DS + IR
    blocks with SE, conv_head) except conv_head carries a BatchNorm (bn2) and
    maps to the trailing ConvBN, and blocks are named MBConv_k.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put_bn(t, path):
        _set(params, path + ("scale",), sd[f"{t}.weight"])
        _set(params, path + ("bias",), sd[f"{t}.bias"])
        _set(stats, path + ("mean",), sd[f"{t}.running_mean"])
        _set(stats, path + ("var",), sd[f"{t}.running_var"])

    _set(params, ("ConvBN_0", "Conv_0", "kernel"), _conv_w(sd["conv_stem.weight"]))
    put_bn("bn1", ("ConvBN_0", "BatchNorm_0"))

    k = 0
    for s, n_blocks in enumerate(stage_blocks):
        for b in range(n_blocks):
            t = f"blocks.{s}.{b}"
            f = f"MBConv_{k}"
            if f"{t}.conv_pwl.weight" in sd:
                _set(params, (f, "ConvBN_0", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_pw.weight"]))
                put_bn(f"{t}.bn1", (f, "ConvBN_0", "BatchNorm_0"))
                _set(params, (f, "ConvBN_1", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_dw.weight"]))
                put_bn(f"{t}.bn2", (f, "ConvBN_1", "BatchNorm_0"))
                proj, proj_src = ("ConvBN_2",), (f"{t}.conv_pwl.weight", f"{t}.bn3")
            else:  # expand_ratio == 1 first block
                _set(params, (f, "ConvBN_0", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_dw.weight"]))
                put_bn(f"{t}.bn1", (f, "ConvBN_0", "BatchNorm_0"))
                proj, proj_src = ("ConvBN_1",), (f"{t}.conv_pw.weight", f"{t}.bn2")
            _set(params, (f, "SqueezeExcite_0", "Conv_0", "kernel"), _conv_w(sd[f"{t}.se.conv_reduce.weight"]))
            _set(params, (f, "SqueezeExcite_0", "Conv_0", "bias"), sd[f"{t}.se.conv_reduce.bias"])
            _set(params, (f, "SqueezeExcite_0", "Conv_1", "kernel"), _conv_w(sd[f"{t}.se.conv_expand.weight"]))
            _set(params, (f, "SqueezeExcite_0", "Conv_1", "bias"), sd[f"{t}.se.conv_expand.bias"])
            _set(params, (f,) + proj + ("Conv_0", "kernel"), _conv_w(sd[proj_src[0]]))
            put_bn(proj_src[1], (f,) + proj + ("BatchNorm_0",))
            k += 1

    _set(params, ("ConvBN_1", "Conv_0", "kernel"), _conv_w(sd["conv_head.weight"]))
    put_bn("bn2", ("ConvBN_1", "BatchNorm_0"))
    return params, stats


# ---------------------------------------------------------------------------
# timm ConvNeXt -> nkbx ConvNeXt
# ---------------------------------------------------------------------------

_CONVNEXT_SPECS = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
}


def convert_convnext_state_dict(state_dict, depths):
    """timm ConvNeXt state_dict -> (params, {}) for nkbx ConvNeXt.

    timm layout: stem.0 (4x4 conv) / stem.1 (LN); stages.{s}.downsample.0 (LN)
    + .1 (2x2 conv) for s>=1; stages.{s}.blocks.{b}.{conv_dw, norm, mlp.fc1,
    mlp.fc2, gamma}; final head norm ('head.norm' in timm >=0.8, 'norm' in
    older checkpoints — both accepted).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}

    def put_ln(t, path):
        _set(params, path + ("scale",), sd[f"{t}.weight"])
        _set(params, path + ("bias",), sd[f"{t}.bias"])

    _set(params, ("Conv_0", "kernel"), _conv_w(sd["stem.0.weight"]))
    _set(params, ("Conv_0", "bias"), sd["stem.0.bias"])
    put_ln("stem.1", ("LayerNorm_0",))

    k = 0  # flat ConvNeXtBlock index
    ln_i, conv_i = 1, 1  # stage-transition LayerNorm_i / Conv_i counters
    for s, depth in enumerate(depths):
        if s > 0:
            put_ln(f"stages.{s}.downsample.0", (f"LayerNorm_{ln_i}",))
            _set(params, (f"Conv_{conv_i}", "kernel"), _conv_w(sd[f"stages.{s}.downsample.1.weight"]))
            _set(params, (f"Conv_{conv_i}", "bias"), sd[f"stages.{s}.downsample.1.bias"])
            ln_i += 1
            conv_i += 1
        for b in range(depth):
            t = f"stages.{s}.blocks.{b}"
            f = f"ConvNeXtBlock_{k}"
            _set(params, (f, "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_dw.weight"]))
            _set(params, (f, "Conv_0", "bias"), sd[f"{t}.conv_dw.bias"])
            put_ln(f"{t}.norm", (f, "LayerNorm_0"))
            _set(params, (f, "Dense_0", "kernel"), np.transpose(sd[f"{t}.mlp.fc1.weight"], (1, 0)))
            _set(params, (f, "Dense_0", "bias"), sd[f"{t}.mlp.fc1.bias"])
            _set(params, (f, "Dense_1", "kernel"), np.transpose(sd[f"{t}.mlp.fc2.weight"], (1, 0)))
            _set(params, (f, "Dense_1", "bias"), sd[f"{t}.mlp.fc2.bias"])
            _set(params, (f, "layer_scale"), sd[f"{t}.gamma"])
            k += 1

    head_norm = "head.norm" if "head.norm.weight" in sd else "norm"
    put_ln(head_norm, ("head_norm",))
    return params, {}


# ---------------------------------------------------------------------------
# CLI: python -m nkbx.models.convert --model resnet50 --weights r50.pth
# ---------------------------------------------------------------------------


def default_filename(name: str) -> str:
    """Checkpoint filename for a backbone name (the single source of truth —
    nkbx.models.registry.pretrained_params_path calls this)."""
    return name.replace("/", "_").replace(" ", "_") + ".msgpack"


def _load_torch_checkpoint(path):
    """Load a torch checkpoint file into a flat {key: np.ndarray} state_dict.

    Accepts a raw state_dict or a wrapper dict with 'state_dict'/'model' keys
    (common timm/lightning layouts); strips 'module.' DataParallel prefixes.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(obj)}")
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "numpy"):
            v = v.float().numpy() if v.dtype.is_floating_point else v.numpy()
        out[k] = np.asarray(v)
    return out


def fetch_torch_state_dict(name: str):
    """Fetch pretrained torch weights from timm/unicom when those packages (and
    network access) are available — the reference's transparent-download path
    (model.py:75-85). Raises ImportError when the source package is missing."""
    if name.lower().startswith("unicom"):
        import unicom  # noqa: F401  (optional dep)

        model, _ = unicom.load(name.split(maxsplit=1)[1])
        return {k: np.asarray(v.float().numpy()) for k, v in model.state_dict().items()}
    import timm

    model = timm.create_model(name, pretrained=True, num_classes=0)
    return {k: np.asarray(v.float().numpy()) for k, v in model.state_dict().items()}


def convert_reference_checkpoint(backbone_name: str, state_dict):
    """Full reference-TRAINED classifier -> nkbx model variables.

    The reference saves ``model.state_dict()`` of SingletaskClassifier /
    MultitaskClassifier (reference model.py:17,88): ``emb_model.<backbone>``
    plus ``classifier.1.{weight,bias}`` (single) or
    ``classifier.<target>.1.{weight,bias}`` (multi). Returns
    {'params': {'backbone', 'head'|'head_<t>'}, 'batch_stats': {'backbone'}}
    — a msgpack of this loads via the config's ``model.checkpoint`` key
    (nkbx get_model warm start), migrating a trained torch model intact.
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    emb = {k[len("emb_model."):]: v for k, v in sd.items()
           if k.startswith("emb_model.")}
    if not emb:
        raise ValueError(
            "no 'emb_model.*' keys — not a reference classifier checkpoint "
            "(for bare backbone weights use convert_torch_state_dict)")
    converted = convert_torch_state_dict(backbone_name, emb)
    params = {"backbone": converted["params"]}
    stats = ({"backbone": converted["batch_stats"]}
             if converted.get("batch_stats") else {})
    if "classifier.1.weight" in sd:  # single-task Sequential(Dropout, Linear)
        params["head"] = {"kernel": np.asarray(sd["classifier.1.weight"]).T,
                          "bias": np.asarray(sd["classifier.1.bias"])}
    else:  # multi-task ModuleDict of Sequentials
        targets = sorted({k.split(".")[1] for k in sd
                          if k.startswith("classifier.") and k.endswith(".1.weight")})
        if not targets:
            raise ValueError("no 'classifier.*' head keys in the checkpoint")
        for t in targets:
            params[f"head_{t}"] = {
                "kernel": np.asarray(sd[f"classifier.{t}.1.weight"]).T,
                "bias": np.asarray(sd[f"classifier.{t}.1.bias"]),
            }
    return {"params": params, "batch_stats": stats}


def main(argv=None):
    import argparse
    import os

    ap = argparse.ArgumentParser(
        description="Convert torch pretrained backbone weights to nkbx msgpack "
                    "(loaded by model.pretrained=True via $NKBX_PRETRAINED_DIR), "
                    "or — with --to-torch — export nkbx-trained weights BACK to "
                    "the torch layouts (timm backbone state_dict, or the full "
                    "reference classifier checkpoint when the weights hold a "
                    "backbone+head tree)."
    )
    ap.add_argument("--model", required=True,
                    help="backbone name, e.g. resnet50 or 'unicom ViT-B/32'")
    ap.add_argument("--weights",
                    help="torch checkpoint file (.pth/.pt/.bin); with "
                         "--to-torch: an nkbx weights artifact (orbax dir "
                         "weights/best|last, or a flax .msgpack). Omit to fetch "
                         "via timm/unicom (requires those packages + network).")
    ap.add_argument("--out",
                    help="output .msgpack path (default: "
                         "$NKBX_PRETRAINED_DIR/<name>.msgpack); with "
                         "--to-torch: the output .pth path (required)")
    ap.add_argument("--reference-checkpoint", action="store_true",
                    help="the weights file is a FULL reference-trained "
                         "classifier (emb_model.* + classifier.*): convert "
                         "backbone AND head; load the output via the config's "
                         "model.checkpoint key")
    ap.add_argument("--to-torch", action="store_true",
                    help="reverse direction: nkbx weights -> torch state_dict "
                         "(.pth). A full classifier tree (params.backbone + "
                         "head) becomes a reference-layout checkpoint "
                         "(emb_model.* + classifier.*); a bare backbone tree "
                         "becomes a timm-layout backbone state_dict. Load "
                         "with strict=False (heads/buffers/counters nkbx "
                         "replaces or recomputes are not emitted; they are "
                         "printed).")
    ap.add_argument("--ema", action="store_true",
                    help="with --to-torch: export the EMA shadow "
                         "(ema_params/ema_batch_stats — what a deployment "
                         "normally serves when the run trained with "
                         "model_ema_decay) instead of the raw params")
    args = ap.parse_args(argv)

    if args.to_torch:
        import torch

        from nkbx.models.reverse import (load_nkbx_weights,
                                         reverse_reference_checkpoint,
                                         reverse_torch_state_dict)

        if not args.weights or not args.out:
            raise SystemExit("--to-torch requires --weights (orbax dir or "
                             ".msgpack) and --out (.pth path)")
        variables = load_nkbx_weights(args.weights, ema=args.ema)
        if "backbone" in variables["params"]:
            sd, skipped = reverse_reference_checkpoint(args.model, variables)
        else:
            sd, skipped = reverse_torch_state_dict(args.model, variables)
        torch.save({k: torch.from_numpy(np.array(v, copy=True))
                    for k, v in sd.items()}, args.out)
        print(f"wrote {args.out} ({len(sd)} tensors; load with strict=False)")
        if skipped:
            print(f"not emitted (torch keeps its own): {', '.join(skipped)}")
        return args.out

    if args.weights:
        sd = _load_torch_checkpoint(args.weights)
    else:
        sd = fetch_torch_state_dict(args.model)

    if args.reference_checkpoint:
        if not args.out:
            # the full-classifier tree is NOT a pretrained-backbone file: the
            # $NKBX_PRETRAINED_DIR default would clobber the backbone msgpack
            # that model pretrained=True loads
            raise SystemExit("--reference-checkpoint requires --out "
                             "(load the result via the config's "
                             "model.checkpoint key)")
        converted = convert_reference_checkpoint(args.model, sd)
    else:
        converted = convert_torch_state_dict(args.model, sd)

    out = args.out
    if not out:
        d = os.environ.get("NKBX_PRETRAINED_DIR")
        if not d:
            raise SystemExit("--out not given and $NKBX_PRETRAINED_DIR not set")
        os.makedirs(d, exist_ok=True)
        out = os.path.join(d, default_filename(args.model))
    save_params_msgpack(converted, out)
    import jax

    n = len(jax.tree_util.tree_leaves(converted))
    print(f"wrote {out} ({n} tensors)")
    return out


# ---------------------------------------------------------------------------
# microsoft/timm Swin V1 -> nkbx SwinTransformer
# ---------------------------------------------------------------------------

_SWIN_SPECS = {
    # name: (embed_dim, depths, n_heads)
    "swin_tiny_patch4_window7_224": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "swin_small_patch4_window7_224": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "swin_base_patch4_window7_224": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
    "swin_large_patch4_window7_224": (192, (2, 2, 18, 2), (6, 12, 24, 48)),
    # window-12 384 variants: same key layout, (23^2, heads) bias tables —
    # the converter is window-agnostic (tables pass through by shape)
    "swin_base_patch4_window12_384": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
    "swin_large_patch4_window12_384": (192, (2, 2, 18, 2), (6, 12, 24, 48)),
}


def convert_swin_state_dict(state_dict, depths):
    """microsoft/original-timm Swin V1 state_dict -> (params, {}) for nkbx
    SwinTransformer. Layout: patch_embed.{proj,norm},
    layers.{i}.blocks.{j}.{norm1, attn.{relative_position_bias_table, qkv,
    proj}, norm2, mlp.{fc1,fc2}}, layers.{i}.downsample.{norm, reduction},
    final norm. Buffers (relative_position_index, attn_mask) are recomputed
    and skipped; head.* is dropped (num_classes=0 semantics)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}

    def put_ln(t, path):
        _set(params, path + ("scale",), sd[f"{t}.weight"])
        _set(params, path + ("bias",), sd[f"{t}.bias"])

    def put_dense(t, path, bias=True):
        _set(params, path + ("kernel",), np.asarray(sd[f"{t}.weight"]).T)
        if bias:
            _set(params, path + ("bias",), sd[f"{t}.bias"])

    _set(params, ("patch_embed", "kernel"), _conv_w(sd["patch_embed.proj.weight"]))
    _set(params, ("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    put_ln("patch_embed.norm", ("patch_norm",))
    # layout probe must be GLOBAL: in the timm >= 0.9 layout layers.{i}.downsample
    # EXISTS for every i >= 1 (it is stage i's INPUT merge), so a per-index
    # existence check would misread stages >= 1 of a 0.9 checkpoint as the
    # pre-0.9 layout (bug found by nkbx/models/torch_ref.py swin replicas)
    pre09 = "layers.0.downsample.reduction.weight" in sd
    for i, depth in enumerate(depths):
        for j in range(depth):
            t = f"layers.{i}.blocks.{j}"
            f = f"stage{i}_block{j}"
            put_ln(f"{t}.norm1", (f, "norm1"))
            _set(params, (f, "attn", "relative_position_bias_table"),
                 sd[f"{t}.attn.relative_position_bias_table"])
            put_dense(f"{t}.attn.qkv", (f, "attn", "qkv"))
            put_dense(f"{t}.attn.proj", (f, "attn", "proj"))
            put_ln(f"{t}.norm2", (f, "norm2"))
            put_dense(f"{t}.mlp.fc1", (f, "fc1"))
            put_dense(f"{t}.mlp.fc2", (f, "fc2"))
        if i != len(depths) - 1:
            # original/pre-0.9-timm: the merge after stage i lives at
            # layers.{i}.downsample; timm >= 0.9 applies it at the INPUT of
            # the next stage, layers.{i+1}.downsample (same tensors — timm's
            # rewrite chose the permute that preserves the concat order)
            ds = (f"layers.{i}.downsample" if pre09
                  else f"layers.{i + 1}.downsample")
            put_ln(f"{ds}.norm", (f"downsample{i}", "norm"))
            put_dense(f"{ds}.reduction", (f"downsample{i}", "reduction"), bias=False)
    put_ln("norm", ("norm",))
    return params, {}


# ---------------------------------------------------------------------------
# timm efficientnetv2 -> nkbx EfficientNetV2
# ---------------------------------------------------------------------------

def _effnetv2_spec(name: str):
    """Spec lives in nkbx.models.efficientnet (single source of truth)."""
    from nkbx.models.efficientnet import V2_L_SPEC, V2_M_SPEC, V2_S_SPEC

    return {"efficientnetv2_s": V2_S_SPEC, "efficientnetv2_m": V2_M_SPEC,
            "efficientnetv2_l": V2_L_SPEC}[name]


_EFFNETV2_SPECS = ("efficientnetv2_s", "efficientnetv2_m", "efficientnetv2_l")


def convert_efficientnetv2_state_dict(state_dict, spec):
    """timm EfficientNetV2 state_dict -> (params, batch_stats) for nkbx
    EfficientNetV2. timm efficientnet-builder layout, blocks.{s}.{b}:
    ConvBnAct (fused e1: conv/bn1), EdgeResidual (fused e>1:
    conv_exp/bn1 + conv_pwl/bn2), InvertedResidual (mb: conv_pw/bn1,
    conv_dw/bn2, se.conv_reduce/se.conv_expand, conv_pwl/bn3)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put_bn(t, path):
        _set(params, path + ("scale",), sd[f"{t}.weight"])
        _set(params, path + ("bias",), sd[f"{t}.bias"])
        _set(stats, path + ("mean",), sd[f"{t}.running_mean"])
        _set(stats, path + ("var",), sd[f"{t}.running_var"])

    _set(params, ("ConvBN_0", "Conv_0", "kernel"), _conv_w(sd["conv_stem.weight"]))
    put_bn("bn1", ("ConvBN_0", "BatchNorm_0"))

    kf = km = 0
    for s, (block, expand, _k, _stride, repeats, _out, _se) in enumerate(spec):
        for b in range(repeats):
            t = f"blocks.{s}.{b}"
            if block == "fused":
                f = f"FusedMBConv_{kf}"
                kf += 1
                if expand == 1:  # timm ConvBnAct
                    _set(params, (f, "ConvBN_0", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv.weight"]))
                    put_bn(f"{t}.bn1", (f, "ConvBN_0", "BatchNorm_0"))
                else:  # timm EdgeResidual
                    _set(params, (f, "ConvBN_0", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_exp.weight"]))
                    put_bn(f"{t}.bn1", (f, "ConvBN_0", "BatchNorm_0"))
                    _set(params, (f, "ConvBN_1", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_pwl.weight"]))
                    put_bn(f"{t}.bn2", (f, "ConvBN_1", "BatchNorm_0"))
            else:  # timm InvertedResidual (v2 mb blocks always expand > 1)
                f = f"MBConv_{km}"
                km += 1
                _set(params, (f, "ConvBN_0", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_pw.weight"]))
                put_bn(f"{t}.bn1", (f, "ConvBN_0", "BatchNorm_0"))
                _set(params, (f, "ConvBN_1", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_dw.weight"]))
                put_bn(f"{t}.bn2", (f, "ConvBN_1", "BatchNorm_0"))
                _set(params, (f, "SqueezeExcite_0", "Conv_0", "kernel"), _conv_w(sd[f"{t}.se.conv_reduce.weight"]))
                _set(params, (f, "SqueezeExcite_0", "Conv_0", "bias"), sd[f"{t}.se.conv_reduce.bias"])
                _set(params, (f, "SqueezeExcite_0", "Conv_1", "kernel"), _conv_w(sd[f"{t}.se.conv_expand.weight"]))
                _set(params, (f, "SqueezeExcite_0", "Conv_1", "bias"), sd[f"{t}.se.conv_expand.bias"])
                _set(params, (f, "ConvBN_2", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv_pwl.weight"]))
                put_bn(f"{t}.bn3", (f, "ConvBN_2", "BatchNorm_0"))

    _set(params, ("ConvBN_1", "Conv_0", "kernel"), _conv_w(sd["conv_head.weight"]))
    put_bn("bn2", ("ConvBN_1", "BatchNorm_0"))
    return params, stats


# ---------------------------------------------------------------------------
# torchvision/timm densenet -> nkbx DenseNet
# ---------------------------------------------------------------------------

_DENSENET_CONFIGS = {
    "densenet121": (6, 12, 24, 16),
    "densenet169": (6, 12, 32, 32),
    "densenet201": (6, 12, 48, 32),
}


def convert_densenet_state_dict(state_dict, block_config):
    """torchvision/timm DenseNet state_dict -> (params, batch_stats) for nkbx
    DenseNet. Key layout (both libraries share it): features.conv0/norm0,
    features.denseblock{b}.denselayer{l}.{norm1,conv1,norm2,conv2},
    features.transition{t}.{norm,conv}, features.norm5."""
    params: dict = {}
    stats: dict = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def put_bn(t, path):
        _set(params, path + ("scale",), sd[f"{t}.weight"])
        _set(params, path + ("bias",), sd[f"{t}.bias"])
        _set(stats, path + ("mean",), sd[f"{t}.running_mean"])
        _set(stats, path + ("var",), sd[f"{t}.running_var"])

    _set(params, ("stem_conv", "kernel"), _conv_w(sd["features.conv0.weight"]))
    put_bn("features.norm0", ("stem_norm",))
    for b, n_layers in enumerate(block_config, start=1):
        for li in range(1, n_layers + 1):
            t = f"features.denseblock{b}.denselayer{li}"
            f = f"block{b-1}_layer{li-1}"
            put_bn(f"{t}.norm1", (f, "bottleneck", "BatchNorm_0"))
            _set(params, (f, "bottleneck", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv1.weight"]))
            put_bn(f"{t}.norm2", (f, "conv", "BatchNorm_0"))
            _set(params, (f, "conv", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv2.weight"]))
        if b != len(block_config):
            t = f"features.transition{b}"
            put_bn(f"{t}.norm", (f"transition{b-1}", "BatchNorm_0"))
            _set(params, (f"transition{b-1}", "Conv_0", "kernel"), _conv_w(sd[f"{t}.conv.weight"]))
    put_bn("features.norm5", ("final_norm",))
    return params, stats


if __name__ == "__main__":
    main()
