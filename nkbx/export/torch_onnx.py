"""ONNX export through the torch replica path — no tf2onnx needed.

The primary ``--to onnx`` route goes SavedModel -> tf2onnx (optional deps).
This module is the OFFLINE fallback that produces a real ``.onnx`` from the
packages already present (torch): the nkbx weights are reverse-converted to
the reference layout (nkbx/models/reverse.py, bit-exact per family), loaded
into the runnable torch replica (nkbx/models/torch_ref.py — forward parity
vs the nkbx model asserted per family in tests/test_replica_forward.py), and
exported with torch's TorchScript ONNX exporter. The emitted graph therefore
computes exactly what the reference's own ``torch.onnx.export``
(reference export.py:146-206) would emit for the same architecture+weights.

The ``onnx`` pip package is not required: torch serializes the ModelProto
itself; its final pass (`_add_onnxscript_fn`) only re-parses the bytes to
inline onnxscript custom functions, of which a plain CNN/ViT graph has none —
when ``onnx`` is absent that pass is patched to the identity.

NCHW inputs (the reference's ONNX contract), f32 weights, metadata JSON
sidecar (the reference embeds metadata_props; editing the proto needs the
onnx package, so the sidecar carries the same dict).
"""

from __future__ import annotations

import contextlib
import json
from pathlib import Path

import numpy as np


def _reference_classifier(replica, emb, classes, task):
    import torch
    from torch import nn

    class ReferenceClassifier(nn.Module):
        """The reference SingletaskClassifier/MultitaskClassifier shape
        (model.py:17-159): emb_model backbone + Sequential(Dropout, Linear)
        head(s); forward = head(features)."""

        def __init__(self):
            super().__init__()
            self.emb_model = replica
            if task == "single":
                self.classifier = nn.Sequential(
                    nn.Dropout(0.0), nn.Linear(emb, len(classes)))
            else:
                self.classifier = nn.ModuleDict({
                    t: nn.Sequential(nn.Dropout(0.0), nn.Linear(emb, len(cs)))
                    for t, cs in classes.items()})

        def forward(self, x):
            feats = self.emb_model(x)
            if task == "single":
                return self.classifier(feats)
            return tuple(self.classifier[t](feats)
                         for t in sorted(self.classifier.keys()))

    return ReferenceClassifier()


@contextlib.contextmanager
def _onnx_package_shim():
    """Identity-patch torch's proto round-trip when ``onnx`` is missing.

    The import probe is kept OUTSIDE the yield: wrapping the yield in the
    same try would swallow ImportErrors raised by the with-body itself
    (contextlib throws them into the generator) and then yield twice."""
    try:
        import onnx  # noqa: F401
        have_onnx = True
    except ImportError:
        have_onnx = False
    if have_onnx:
        yield
        return
    try:
        from torch.onnx._internal.torchscript_exporter import (
            onnx_proto_utils as _opu)
    except ImportError as e:  # torch layout changed — needs a real onnx pkg
        raise RuntimeError(
            "torch-based ONNX export needs either the 'onnx' package or a "
            "torch version with the torchscript exporter internals") from e
    orig = _opu._add_onnxscript_fn
    _opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        yield
    finally:
        _opu._add_onnxscript_fn = orig


def _build_verified_wrapper(model, backbone_name, input_shape, verify,
                            verify_atol):
    """Reverse-convert + load into the reference-shaped replica classifier;
    optionally assert logits parity vs the nkbx model. Returns the eval-mode
    torch module."""
    import torch

    from nkbx.models.reverse import reverse_reference_checkpoint
    from nkbx.models.torch_ref import build_replica

    _n, h, w, _c = input_shape
    sd, _skipped = reverse_reference_checkpoint(backbone_name, model.variables)
    replica = build_replica(backbone_name)
    wrap = _reference_classifier(replica, model.emb_size, model.classes,
                                 model.task)
    tensors = {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = wrap.load_state_dict(tensors, strict=False)
    if unexpected:
        raise RuntimeError(
            f"reverse-converted weights hold keys the replica has no slot "
            f"for (converter drift): {unexpected[:5]}")
    bad = [k for k in missing
           if not (k.endswith("num_batches_tracked")
                   or k.endswith("relative_position_index")
                   or k.endswith("attn_mask")
                   or k.startswith(("emb_model.fc", "emb_model.head",
                                    "emb_model.classifier")))]
    if bad:
        raise RuntimeError(f"replica is missing real weights: {bad[:5]}")
    wrap.eval()

    if verify:
        import jax.numpy as jnp

        # the replica computes in f32; an nkbx model built with bf16 compute
        # (enable_mixed_precision configs) carries ~1e-2 relative logit drift
        # that is correct behavior, not weight error — widen the gate there
        if jnp.dtype(getattr(getattr(model.module, "backbone", None), "dtype",
                             jnp.float32)) == jnp.bfloat16:
            verify_atol = max(verify_atol, 7.5e-2)
        x = np.random.default_rng(0).normal(size=(2, h, w, 3)).astype(np.float32)
        ours = model.apply(model.variables, jnp.asarray(x), train=False)
        with torch.no_grad():
            theirs = wrap(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        if model.task == "multi":
            targets = sorted(model.classes.keys())
            ours = [np.asarray(ours[t]) for t in targets]
            theirs = [t.numpy() for t in theirs]
        else:
            ours, theirs = [np.asarray(ours)], [theirs.numpy()]
        for o, t in zip(ours, theirs):
            np.testing.assert_allclose(o, t, atol=verify_atol, rtol=1e-3)
    return wrap


def export_torchscript_via_torch(model, backbone_name, out_path, input_shape,
                                 metadata=None, verify: bool = True,
                                 verify_atol: float = 5e-3):
    """Export a ClassificationModel as TORCHSCRIPT — the reference's primary
    per-epoch artifact (reference train.py:66-73 / export.py:208-227) —
    through the runnable torch replica with reverse-converted weights.

    The emitted ``.pt`` loads with plain ``torch.jit.load`` into the
    reference repo's eval/inference/TensorRT tooling (reference
    model.py:163-164 ``scripted: True``). NCHW inputs; metadata embedded as
    ``config.txt`` in ``_extra_files`` exactly like the reference's export.
    Returns (out_path, metadata)."""
    import torch

    wrap = _build_verified_wrapper(model, backbone_name, input_shape, verify,
                                   verify_atol)
    n, h, w, _c = input_shape
    dummy = torch.zeros(max(int(n), 1), 3, h, w)
    with torch.no_grad():
        traced = torch.jit.trace(wrap, dummy)
    meta = dict(metadata or {})
    meta.update({"exporter": "torch-replica", "layout": "NCHW",
                 "backbone": backbone_name})
    out_path = Path(out_path)
    traced.save(str(out_path), _extra_files={"config.txt": json.dumps(meta)})
    return out_path, meta


def export_onnx_via_torch(model, backbone_name, out_path, input_shape,
                          metadata=None, dynamic_batch: bool = True,
                          opset: int = 17, verify: bool = True,
                          verify_atol: float = 5e-3):
    """Export a ClassificationModel to ``.onnx`` through the torch replica.

    model: nkbx ClassificationModel; backbone_name: its registry name (the
    replica/reverse-conversion key); input_shape: NHWC (N,H,W,C) like the
    rest of export.py — the EMITTED graph consumes NCHW (reference ONNX
    contract). ``verify=True`` asserts replica logits == nkbx logits on a
    random batch before writing. Returns (out_path, metadata).
    """
    import torch

    wrap = _build_verified_wrapper(model, backbone_name, input_shape, verify,
                                   verify_atol)
    n, h, w, _c = input_shape
    out_path = Path(out_path)
    if model.task == "multi":
        output_names = sorted(model.classes.keys())
    else:
        output_names = ["output"]  # reference export.py:149 crashes here
                                   # (list(classes.keys()) on a list) — fixed
    # every replica forward — CNN and transformer alike — traces
    # batch-polymorphic (transformer reshapes keep the batch dim -1 and take
    # only static dims from x.shape; verified at bs {1,4,16} in
    # tests/test_cli.py), so dynamic batch axes are declared for all families,
    # matching the reference's export surface (reference export.py:169-176)
    dyn = ({"images": {0: "batch"},
            **{o: {0: "batch"} for o in output_names}}
           if dynamic_batch else None)
    dummy = torch.zeros(max(int(n), 1), 3, h, w)
    with _onnx_package_shim():
        torch.onnx.export(wrap, (dummy,), str(out_path), dynamo=False,
                          opset_version=opset, input_names=["images"],
                          output_names=output_names, dynamic_axes=dyn)
    meta = dict(metadata or {})
    meta.update({"exporter": "torch-replica", "layout": "NCHW",
                 "backbone": backbone_name, "opset": opset,
                 "output_names": output_names})
    out_path.with_suffix(out_path.suffix + ".json").write_text(json.dumps(meta))
    return out_path, meta
