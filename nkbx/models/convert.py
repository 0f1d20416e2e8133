"""Torch->Flax pretrained-weight conversion scaffolding.

The reference gets pretrained backbones from timm/unicom (model.py:75-85), which
ship torch ``state_dict``s. nkbx loads converted Flax param trees from
``$NKBX_PRETRAINED_DIR/<name>.msgpack``. This module holds the serialization
helpers; per-family converters (torch layout -> nkbx layout) are added as weight
parity work lands (tracked in SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

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
