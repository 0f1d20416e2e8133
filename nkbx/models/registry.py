"""Backbone registry — timm/unicom-name-compatible ``create_backbone``.

The reference resolves backbones via ``timm.create_model(name, num_classes=0)``
or ``unicom.load(name.split()[1])`` (reference model.py:74-85). nkbx resolves the
same names to Flax modules. ``pretrained=True`` looks for a converted checkpoint
under ``NKBX_PRETRAINED_DIR`` (torch->Flax converter: nkbx/models/convert.py);
absent that, it warns and initializes randomly.
"""

from __future__ import annotations

import os
import warnings
from typing import Any

import jax.numpy as jnp

from nkbx.models import convnext, densenet, efficientnet, mobilenetv3, resnet, swin, vit

_REGISTRY = {
    "resnet_tiny_test": resnet.resnet_tiny_test,  # for tests on 1-core CPU hosts
    "resnet14t": resnet.resnet14t,
    "resnet18": resnet.resnet18,
    "resnet18d": resnet.resnet18d,
    "resnet26": resnet.resnet26,
    "resnet34": resnet.resnet34,
    "resnet34d": resnet.resnet34d,
    "resnet50": resnet.resnet50,
    "resnet50d": resnet.resnet50d,
    "resnet101": resnet.resnet101,
    "resnet152": resnet.resnet152,
    "resnext50_32x4d": resnet.resnext50_32x4d,
    "resnext101_32x8d": resnet.resnext101_32x8d,
    "wide_resnet50_2": resnet.wide_resnet50_2,
    "seresnet50": resnet.seresnet50,
    "seresnext50_32x4d": resnet.seresnext50_32x4d,
    "mobilenetv3_large_100": mobilenetv3.mobilenetv3_large_100,
    "mobilenetv3_small_100": mobilenetv3.mobilenetv3_small_100,
    "efficientnet_b0": efficientnet.efficientnet_b0,
    "efficientnet_b1": efficientnet.efficientnet_b1,
    "efficientnet_b2": efficientnet.efficientnet_b2,
    "efficientnet_b3": efficientnet.efficientnet_b3,
    "efficientnet_b4": efficientnet.efficientnet_b4,
    "efficientnet_b5": efficientnet.efficientnet_b5,
    "efficientnet_b6": efficientnet.efficientnet_b6,
    "efficientnet_b7": efficientnet.efficientnet_b7,
    "efficientnetv2_s": efficientnet.efficientnetv2_s,
    "efficientnetv2_m": efficientnet.efficientnetv2_m,
    "efficientnetv2_l": efficientnet.efficientnetv2_l,
    "densenet121": densenet.densenet121,
    "densenet169": densenet.densenet169,
    "densenet201": densenet.densenet201,
    "convnext_tiny": convnext.convnext_tiny,
    "convnext_small": convnext.convnext_small,
    "convnext_base": convnext.convnext_base,
    "convnext_large": convnext.convnext_large,
    "convnext_xlarge": convnext.convnext_xlarge,
    "swin_tiny_patch4_window7_224": swin.swin_tiny_patch4_window7_224,
    "swin_small_patch4_window7_224": swin.swin_small_patch4_window7_224,
    "swin_base_patch4_window7_224": swin.swin_base_patch4_window7_224,
    "swin_large_patch4_window7_224": swin.swin_large_patch4_window7_224,
    "swin_base_patch4_window12_384": swin.swin_base_patch4_window12_384,
    "swin_large_patch4_window12_384": swin.swin_large_patch4_window12_384,
    "vit_tiny_patch16_224": vit.vit_tiny_patch16_224,
    "vit_small_patch16_224": vit.vit_small_patch16_224,
    "vit_small_patch32_224": vit.vit_small_patch32_224,
    "vit_base_patch16_224": vit.vit_base_patch16_224,
    "vit_base_patch32_224": vit.vit_base_patch32_224,
    "vit_large_patch16_224": vit.vit_large_patch16_224,
    "deit_tiny_patch16_224": vit.deit_tiny_patch16_224,
    "deit_small_patch16_224": vit.deit_small_patch16_224,
    "deit_base_patch16_224": vit.deit_base_patch16_224,
    "vit_tiny_patch16_384": vit.vit_tiny_patch16_384,
    "vit_small_patch16_384": vit.vit_small_patch16_384,
    "vit_small_patch32_384": vit.vit_small_patch32_384,
    "vit_base_patch16_384": vit.vit_base_patch16_384,
    "vit_base_patch32_384": vit.vit_base_patch32_384,
    "vit_large_patch16_384": vit.vit_large_patch16_384,
    "vit_large_patch32_384": vit.vit_large_patch32_384,
}

_UNICOM = {
    "ViT-B/32": vit.unicom_vit_b32,
    "ViT-B/16": vit.unicom_vit_b16,
    "ViT-L/14": vit.unicom_vit_l14,
}


def list_backbones():
    return sorted(_REGISTRY) + [f"unicom {k}" for k in sorted(_UNICOM)]


def create_backbone(name: str, pretrained: bool = False, drop_rate: float = 0.0,
                    dtype: Any = jnp.bfloat16, **opts):
    """Build a backbone module by timm/unicom-style name.

    Returns the Flax module; ``module.num_features`` is the embedding size
    (the reference's ``emb_size``, model.py:79,83).

    ``**opts`` forwards family-specific module fields (config key
    ``model.backbone_opts``), e.g. ResNet ``ghost_bn``/``fused_bottleneck``/
    ``remat_stages``/``input_norm``, Swin/ViT ``fused_attention``/
    ``fused_mlp``. Unknown options fail loudly (flax dataclass TypeError).
    """
    if name.lower().startswith("unicom"):
        parts = name.split(maxsplit=1)
        variant = parts[1] if len(parts) > 1 else ""
        if variant not in _UNICOM:
            raise NotImplementedError(f"Unknown unicom variant {variant!r}; have {sorted(_UNICOM)}")
        ctor = _UNICOM[variant]
    elif name in _REGISTRY:
        ctor = _REGISTRY[name]
    else:
        # The reference accepts ANY timm name (model.py:82-83); nkbx's
        # contract is an explicit supported set with a loud error + nearest
        # name (MIGRATING.md "Supported backbones"). New families are Flax
        # ports — added on demand.
        import difflib

        close = difflib.get_close_matches(name, list_backbones(), n=3, cutoff=0.4)
        hint = f" Did you mean {' / '.join(repr(c) for c in close)}?" if close else ""
        raise NotImplementedError(
            f"Unknown backbone {name!r}.{hint} nkbx supports an explicit "
            f"{len(list_backbones())}-name set (the reference accepts any timm "
            f"name); see MIGRATING.md 'Supported backbones' or "
            f"nkbx.models.list_backbones(). Full list: {list_backbones()}"
        )
    module = ctor(drop_rate=drop_rate, dtype=dtype, **opts)
    if pretrained and not pretrained_params_path(name):
        if not _fetch_and_convert(name):
            warnings.warn(
                f"pretrained=True but no converted checkpoint for {name!r} under "
                f"$NKBX_PRETRAINED_DIR — initializing randomly. Convert torch "
                f"weights with `python -m nkbx.models.convert --model {name!r} "
                f"--weights <torch file>` (or install timm/unicom for "
                f"transparent fetch)."
            )
    return module


def _fetch_and_convert(name: str):
    """Transparent pretrained fetch (the reference's model.py:75-85 behavior):
    when timm/unicom are installed and $NKBX_PRETRAINED_DIR is set, download
    the torch weights, convert, and cache the msgpack. Returns the cached path
    or None when the source package/network/dir is unavailable."""
    d = os.environ.get("NKBX_PRETRAINED_DIR", "")
    if not d:
        return None
    from nkbx.models.convert import (
        convert_torch_state_dict,
        default_filename,
        fetch_torch_state_dict,
        save_params_msgpack,
    )

    try:
        sd = fetch_torch_state_dict(name)
    except Exception as e:  # no timm/unicom installed, no network, unknown name
        warnings.warn(f"pretrained fetch for {name!r} failed: {e}")
        return None
    # conversion errors propagate: a converter bug must NOT silently degrade
    # pretrained=True to random initialization
    converted = convert_torch_state_dict(name, sd)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, default_filename(name))
    save_params_msgpack(converted, path)
    return path


def pretrained_params_path(name: str):
    from nkbx.models.convert import default_filename

    d = os.environ.get("NKBX_PRETRAINED_DIR", "")
    if not d:
        return None
    p = os.path.join(d, default_filename(name))
    return p if os.path.exists(p) else None
