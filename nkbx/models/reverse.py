"""Flax->torch reverse weight conversion (train on TPU, deploy on torch).

Completes the two-way migration story around :mod:`nkbx.models.convert`: a
model trained in nkbx can be exported back to the torch layouts the reference
stack consumes — a timm/torchvision/unicom-layout backbone ``state_dict`` or
a full reference-trained classifier checkpoint (``emb_model.* +
classifier.*``, reference model.py:17,88 / train.py:59-73) that the
reference repo can load for its own eval/export/TensorRT path unchanged.

Mechanism: every forward converter in nkbx.models.convert is a pure element
PERMUTATION of the torch tensors (transposes, reshapes, slices, the
space-to-depth stem regroup) — so the inverse need not be hand-written per
family. ``reverse_torch_state_dict`` traces it generically: fill a
template state_dict (from :mod:`nkbx.models.torch_ref`, the replica modules
that pin each family's upstream key layout) with unique integer element ids,
run the forward converter once, and read the resulting id placement as the
inverse map. Zero-valued trace slots are positions the forward conversion
*synthesizes* (the dead taps of the space-to-depth stem pad, zero-filled
biases for torch convs that have none) and are correctly dropped on the way
back. The trace is exact by construction — ids are integers well inside
float64/int64 range and every converter op is dtype-preserving numpy — and
any future converter that stopped being a permutation fails loudly here
(partial-consumption check) instead of silently corrupting weights.

Keys the forward conversion never consumes (classifier heads that nkbx
replaces, ``num_batches_tracked`` counters, recomputed swin buffers) are NOT
emitted; load the result with ``strict=False`` — the returned ``skipped``
list is torch's ``missing_keys`` (except ``num_batches_tracked`` entries,
which torch's BatchNorm backward-compat loader fills with 0 silently
instead of reporting).

The emitted layout is the one the :mod:`nkbx.models.torch_ref` replicas pin
— the CURRENT upstream layout per family (timm >= 0.9 swin ``downsample``
placement, bias-free unicom patch embed). Forward conversion also accepts
older variants (pre-0.9 swin, bias-carrying unicom); those reverse into the
modern layout, not back into the variant they came from.

CLI (see nkbx.models.convert.main): ``python -m nkbx.models.convert
--to-torch --model resnet50 --weights runs/x/weights/best --out r50.pth``.
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np


def _walk(tree, path=()):
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, Mapping):
            yield from _walk(v, path + (k,))
        else:
            yield path + (k,), v


def _lookup(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, Mapping) or p not in node:
            raise KeyError(
                f"converted tree is missing {'/'.join(path)} — was the model "
                f"trained with non-default structure flags (e.g. a ResNet "
                f"with s2d_stem=False)? The reverse trace assumes the same "
                f"structure convert_torch_state_dict produces.")
        node = node[p]
    return node


def template_state_dict(name: str):
    """The torch-layout template for backbone ``name``: an OrderedDict of
    torch tensors from the :mod:`nkbx.models.torch_ref` replica (the exact
    upstream timm/torchvision/unicom key layout)."""
    import torch

    from nkbx.models.torch_ref import build_replica

    with torch.no_grad():
        return build_replica(name).state_dict()


def reverse_torch_state_dict(name: str, converted):
    """nkbx backbone tree -> timm-layout torch ``state_dict``.

    ``converted`` is ``{'params': ..., 'batch_stats': ...}`` — the tree
    :func:`nkbx.models.convert.convert_torch_state_dict` produces and the
    nkbx backbone trains (identical paths, asserted by tests/test_convert).

    Returns ``(state_dict, skipped)``: a dict of float32 numpy arrays (load
    with ``strict=False``) and the template keys that have no nkbx source
    (heads, buffers, num_batches_tracked) — exactly torch's missing_keys.
    """
    from nkbx.models.convert import convert_torch_state_dict

    template = template_state_dict(name)

    # 1. trace: unique positive element ids through the forward converter
    trace_sd = {}
    spans = {}
    total = 1  # id 0 = "synthesized by the converter, no torch source"
    for k, v in template.items():
        n = v.numel()
        trace_sd[k] = np.arange(total, total + n, dtype=np.int64).reshape(
            tuple(v.shape))
        spans[k] = (total, total + n)
        total += n
    traced = convert_torch_state_dict(name, trace_sd)

    # 2. scatter the trained values back through the traced id placement.
    # float32 is lossless here: every leaf any forward converter consumes is
    # a float32 torch tensor (integer buffers — num_batches_tracked, swin
    # index buffers — are never consumed), asserted per-key in step 3.
    flat = np.zeros(total, dtype=np.float32)
    written = np.zeros(total, dtype=bool)
    traced_paths = {path for path, _ in _walk(traced)}
    extra = [p for p, _ in _walk(converted) if p not in traced_paths]
    if extra:
        raise ValueError(
            f"the converted tree holds leaves the {name!r} forward converter "
            f"never produces ({', '.join('/'.join(p) for p in extra[:5])}"
            f"{', ...' if len(extra) > 5 else ''}) — wrong --model for these "
            f"weights? Silently dropping them would corrupt the export.")
    for path, ids in _walk(traced):
        ids = np.asarray(ids)
        val = np.asarray(_lookup(converted, path))
        if ids.shape != tuple(val.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: converter produces "
                f"{ids.shape}, converted tree holds {val.shape}")
        ids = ids.ravel()
        val = val.astype(np.float32).ravel()
        if not np.issubdtype(ids.dtype, np.integer):
            # a leaf the converter synthesized wholesale (e.g. a zeros bias
            # for a bias-free torch conv): nothing to carry back — but warn
            # loudly if training moved it, because the torch layout has no
            # slot for it and the reverse would silently change the model
            if np.any(val):
                import warnings

                warnings.warn(
                    f"{'/'.join(path)} has no torch-side tensor (the forward "
                    f"conversion synthesizes it) but carries trained non-zero "
                    f"values — they cannot be represented in the {name!r} "
                    f"torch layout and are dropped", stacklevel=2)
            continue
        live = ids > 0
        if written[ids[live]].any():
            raise ValueError(
                f"{'/'.join(path)} re-places torch elements another leaf "
                f"already carried — the forward converter duplicates source "
                f"elements (weight tying?) and is no longer a permutation; "
                f"the generic reverse cannot decide which trained copy wins")
        flat[ids[live]] = val[live]
        written[ids[live]] = True

    # 3. rebuild per-key tensors; unconsumed keys are skipped (not emitted)
    out = {}
    skipped = []
    for k, v in template.items():
        lo, hi = spans[k]
        w = written[lo:hi]
        if hi == lo or not w.any():
            skipped.append(k)
            continue
        if not w.all():
            raise ValueError(
                f"template key {k!r} is only partially consumed by the "
                f"forward converter ({int(w.sum())}/{hi - lo} elements) — "
                f"the conversion is no longer a per-key permutation and the "
                f"generic reverse cannot invert it")
        dtype = v.numpy().dtype
        if not np.issubdtype(dtype, np.floating):
            raise ValueError(
                f"template key {k!r} is {dtype} but was consumed by the "
                f"forward converter — the float32 scatter path only supports "
                f"floating-point weights")
        out[k] = flat[lo:hi].reshape(tuple(v.shape)).astype(dtype)
    return out, skipped


def reverse_reference_checkpoint(backbone_name: str, variables):
    """nkbx classifier variables -> a reference-layout torch checkpoint.

    The inverse of :func:`nkbx.models.convert.convert_reference_checkpoint`:
    takes the full nkbx model variables (``{'params': {'backbone',
    'head'|'head_<t>'}, 'batch_stats': {'backbone': ...}}`` — what
    train.py's msgpack/orbax checkpoints hold) and emits the state_dict the
    reference's SingletaskClassifier / MultitaskClassifier saves
    (``emb_model.*`` + ``classifier[.<target>].1.{weight,bias}``, reference
    model.py:17-159), so a TPU-trained model drops into the reference
    repo's eval/export/TensorRT tooling. Load with ``strict=False`` (the
    ``skipped`` list = missing_keys, all under ``emb_model.``).
    """
    params = variables["params"]
    if "backbone" not in params:
        raise ValueError(
            "expected full classifier variables with a 'backbone' subtree — "
            "for a bare backbone tree use reverse_torch_state_dict")
    backbone_sd, skipped = reverse_torch_state_dict(
        backbone_name,
        {"params": params["backbone"],
         "batch_stats": dict(variables.get("batch_stats", {})).get(
             "backbone", {})})
    out = {f"emb_model.{k}": v for k, v in backbone_sd.items()}
    heads = {k: v for k, v in params.items() if k.startswith("head")}
    if not heads:
        raise ValueError("no 'head'/'head_<target>' subtree in params")
    for hk, head in heads.items():
        # nkbx head Dense (in, out) -> torch Linear (out, in); the reference
        # head is Sequential(Dropout, Linear) so the Linear sits at index 1
        prefix = ("classifier.1" if hk == "head"
                  else f"classifier.{hk[len('head_'):]}.1")
        out[f"{prefix}.weight"] = np.ascontiguousarray(
            np.asarray(head["kernel"], dtype=np.float64).T.astype(np.float32))
        out[f"{prefix}.bias"] = np.asarray(head["bias"], dtype=np.float32)
    return out, [f"emb_model.{k}" for k in skipped]


def load_nkbx_weights(path, ema: bool = False):
    """Model variables from an nkbx weights artifact: an orbax checkpoint
    dir (``weights/best`` / ``weights/last``) or a flax msgpack file (the
    portable dump train.py writes alongside, or a converted-backbone file).

    ``ema=True`` selects the EMA shadow (``ema_params``/``ema_batch_stats``,
    present when the run trained with ``model_ema_decay``) — the weights a
    deployment normally wants; raises if the artifact has none.
    """
    from pathlib import Path

    p = Path(path)
    if p.is_dir():
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(p.resolve())
    else:
        import flax.serialization

        with open(p, "rb") as f:
            restored = flax.serialization.msgpack_restore(f.read())
    if ema:
        if not restored.get("ema_params"):
            raise ValueError(
                f"{path} holds no separate EMA shadow (ema_params). Full "
                f"train-state artifacts (orbax weights/best|last) carry one "
                f"when the run trained with model_ema_decay; the portable "
                f"best/last.msgpack of an EMA run already holds the EMA "
                f"weights AS its params (nkbx/train/trainer.py) — for those, "
                f"drop --ema.")
        return {"params": restored["ema_params"],
                "batch_stats": restored.get("ema_batch_stats") or {}}
    return {"params": restored["params"],
            "batch_stats": restored.get("batch_stats") or {}}
