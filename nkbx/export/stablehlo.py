"""StableHLO export — the TPU-native deployment lowering.

Replaces the reference's ONNX/TorchScript/TensorRT chain (export.py:146-301):
``jax.export`` serializes the jitted inference function (weights baked in) as
portable StableHLO with an optional *symbolic batch dimension* — the analog of a
TensorRT dynamic-batch optimization profile, except any batch size works and the
runtime compiles/caches per bucket on load.

Bundle format mirrors the reference's engine file (export.py:295-301):
    4-byte little-endian metadata length | JSON metadata | serialized StableHLO
Extension: ``.nkbx``.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path

import jax
import jax.numpy as jnp


def make_metadata(classes, input_shape, task="single", description=""):
    """Model metadata (reference export.py:126-135 keys)."""
    import nkbx

    return {
        "description": description or "nkbx classification model",
        "author": "nkbx",
        "date": datetime.now().isoformat(),
        "version": nkbx.__version__,
        "batch": input_shape[0],
        "imgsz": list(input_shape[1:3]),
        "layout": "NHWC",
        "task": task,
        "classes": classes,
    }


def export_model(model, input_shape, save_path, metadata=None, dynamic_batch=True,
                 dtype=jnp.float32, dynamic="batch", spatial_multiple=32,
                 fused_attention=False):
    """Export a ClassificationModel's inference fn to a .nkbx bundle.

    Args:
        model: nkbx ClassificationModel (variables are baked into the program).
        input_shape: (B, H, W, C) — B is the max/typical batch; with
            ``dynamic != 'none'`` the exported program is batch-polymorphic.
        save_path: output file path (``.nkbx``).
        metadata: optional metadata dict (defaults via :func:`make_metadata`).
        dynamic: 'none' | 'batch' | 'all' — the reference ``--dynamic`` surface
            (export.py:80-88,257-269). 'all' additionally makes H and W
            symbolic (constrained to multiples of ``spatial_multiple``, the
            backbone's total stride — CNN backbones only; ViT positional
            embeddings pin the spatial size, as they do for the reference's
            ONNX dynamic axes).
        dynamic_batch: legacy bool form of ``dynamic`` ('batch' when True).
        fused_attention: keep the fused Pallas lowerings — window attention
            AND the fused MLP (nkbx/ops/mlp.py) — in the bundle (+44%
            serving throughput for Swin attention alone on TPU, PERF.md)
            instead of force-disabling them. The resulting bundle embeds
            ``tpu_custom_call``s — it is TPU-ONLY and carries no
            cross-release compatibility guarantee (the default, portable
            bundle has neither). Requires ``dynamic='none'``: the kernels'
            block pickers need concrete row/window counts. Traced on a
            non-TPU backend the models' auto modes skip the kernels anyway,
            so this flag only changes the artifact when exporting on the
            TPU host that will serve it.
    """
    from jax import export as jexp

    variables = jax.device_get(model.variables)
    module = model.module

    def infer(x):
        return module.apply(variables, x, train=False)

    if dynamic == "batch" and not dynamic_batch:
        dynamic = "none"
    b, h, w, c = input_shape
    if dynamic == "all":
        m = spatial_multiple
        bdim, hdim, wdim = jexp.symbolic_shape(f"b, {m}*h, {m}*w")
        arg = jax.ShapeDtypeStruct((bdim, hdim, wdim, c), dtype)
    elif dynamic == "batch":
        (bdim,) = jexp.symbolic_shape("b")
        arg = jax.ShapeDtypeStruct((bdim, h, w, c), dtype)
    else:
        arg = jax.ShapeDtypeStruct((b, h, w, c), dtype)

    from nkbx.ops.attention import disable_fused

    if fused_attention:
        if dynamic != "none":
            raise ValueError(
                "fused_attention export requires dynamic='none': the Pallas "
                "block picker needs a concrete window count")
        exported = jexp.export(
            jax.jit(infer),
            disabled_checks=[jexp.DisabledSafetyCheck.custom_call("tpu_custom_call")],
        )(arg)
    else:
        with disable_fused():  # Pallas attention is not export-portable
            exported = jexp.export(jax.jit(infer))(arg)
    blob = exported.serialize()

    meta = metadata or make_metadata(model.classes, input_shape, model.task)
    if fused_attention:
        meta = dict(meta, fused_attention=True)
    meta_bytes = json.dumps(meta).encode()
    save_path = Path(save_path)
    with open(save_path, "wb") as f:
        f.write(len(meta_bytes).to_bytes(4, byteorder="little", signed=True))
        f.write(meta_bytes)
        f.write(blob)
    return save_path, meta


def load_exported(path):
    """Read a .nkbx bundle -> (metadata dict, jax.export.Exported)."""
    from jax import export as jexp

    with open(path, "rb") as f:
        meta_len = int.from_bytes(f.read(4), byteorder="little", signed=True)
        metadata = json.loads(f.read(meta_len).decode())
        exported = jexp.deserialize(f.read())
    return metadata, exported


def save_stablehlo_text(model, input_shape, save_path, dtype=jnp.float32):
    """Dump human-readable StableHLO MLIR (debugging / external toolchains)."""
    variables = jax.device_get(model.variables)
    module = model.module

    def infer(x):
        return module.apply(variables, x, train=False)

    from nkbx.ops.attention import disable_fused

    with disable_fused():  # Pallas attention is not export-portable
        lowered = jax.jit(infer).lower(jax.ShapeDtypeStruct(tuple(input_shape), dtype))
    text = lowered.as_text(dialect="stablehlo")
    Path(save_path).write_text(text)
    return save_path
