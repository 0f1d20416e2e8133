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

import re

import numpy as np

import flax.serialization


def save_params_msgpack(params, path):
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def load_params_msgpack(path, target):
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target, f.read())


def load_pretrained_into(variables, path):
    """Load a converted backbone param tree into a model's variables.

    The msgpack stores {'params': {...}, 'batch_stats': {...}} for the BACKBONE
    subtree only; the classifier head keeps its fresh init (matching the
    reference, where timm weights cover the backbone and the head is new).
    """
    target = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables.get("batch_stats", {}).get("backbone", {}),
    }
    loaded = load_params_msgpack(path, target)
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


def convert_resnet_state_dict(state_dict, stage_sizes, tiered_stem=False):
    """timm ResNet state_dict -> (params, batch_stats) for nkbx ResNet.

    Handles the default 7x7 stem and the tiered 3x conv stem (timm *t models:
    conv1 is a Sequential of conv/bn/act x3 with the last bn named ``bn1``).
    Blocks are flat-numbered in nkbx (BasicBlock_k / Bottleneck_k across
    stages) matching timm's layer{L}.{B} in order.
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
        _set(params, ("ConvBN_0", "Conv_0", "kernel"), _conv_w(sd["conv1.weight"]))
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
            if f"{t}.downsample.0.weight" in sd:
                _set(params, (f, "downsample", "Conv_0", "kernel"), _conv_w(sd[f"{t}.downsample.0.weight"]))
                put_bn(f"{t}.downsample.1", (f, "downsample", "BatchNorm_0"))
            k += 1

    return params, stats


_RESNET_SPECS = {
    "resnet14t": ((1, 1, 1, 1), True),
    "resnet18": ((2, 2, 2, 2), False),
    "resnet26": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), False),
    "resnet101": ((3, 4, 23, 3), False),
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
    raise NotImplementedError(
        f"torch->flax conversion for {name!r} not implemented yet "
        f"(have: {sorted(_RESNET_SPECS)})"
    )
