"""TensorFlow SavedModel export via jax2tf — the portable-artifact analog of
the reference's ONNX path (export.py:146-206).

The .nkbx StableHLO bundle is the native TPU serving format; a SavedModel is
what non-JAX consumers (TF Serving, TFLite converters, ONNX via tf2onnx) can
ingest. Model metadata (the reference's embedded-JSON contract,
export.py:126-135) is written as ``metadata.json`` inside the SavedModel
directory, with ``classes.json`` alongside for the classes-file consumers.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax


def export_savedmodel(model, input_shape, save_dir, metadata=None,
                      dynamic_batch: bool = True, dtype=None):
    """Export a ClassificationModel to a TF SavedModel directory.

    The serving signature takes float32 NHWC input (batch dim dynamic when
    ``dynamic_batch``); multi-task models return a dict of logits keyed by
    target name, matching the reference's ONNX output_names (export.py:149).
    """
    import jax.numpy as jnp
    import tensorflow as tf
    from jax.experimental import jax2tf

    from nkbx.export.stablehlo import make_metadata

    dtype = dtype or jnp.float32
    variables = jax.device_get(model.variables)
    module = model.module

    def infer(x):
        return module.apply(variables, x.astype(dtype), train=False)

    b, h, w, c = input_shape
    poly = "(b, _, _, _)" if dynamic_batch else None
    tf_fn = jax2tf.convert(infer, polymorphic_shapes=[poly] if poly else None)

    wrapper = tf.Module()
    batch_dim = None if dynamic_batch else b
    wrapper.f = tf.function(
        tf_fn,
        autograph=False,
        input_signature=[tf.TensorSpec([batch_dim, h, w, c], tf.float32, name="images")],
    )
    save_dir = Path(save_dir)
    from nkbx.ops.attention import disable_fused

    with disable_fused():  # tf.function traces here; Pallas isn't TF-portable
        tf.saved_model.save(wrapper, str(save_dir))

    meta = metadata or make_metadata(model.classes, input_shape, model.task)
    (save_dir / "metadata.json").write_text(json.dumps(meta))
    (save_dir / "classes.json").write_text(json.dumps(model.classes))
    return save_dir, meta


def export_onnx(model, input_shape, out_path, metadata=None,
                dynamic_batch: bool = True, dtype=None, opset: int = 17,
                simplify: bool = False):
    """Export a ClassificationModel to ``.onnx`` via SavedModel -> tf2onnx
    (the reference's primary interchange artifact, export.py:146-206 there).

    ``tf2onnx``/``onnx`` are OPTIONAL dependencies: when absent this raises a
    RuntimeError naming the exact recipe (the SavedModel it already wrote +
    the one-line tf2onnx command) so the conversion can be finished on any
    machine with the packages installed."""
    import tempfile

    out_path = Path(out_path)
    sm_dir = out_path.with_suffix("")  # keep the intermediate next to the .onnx
    if sm_dir == out_path:
        sm_dir = Path(tempfile.mkdtemp(prefix="nkbx_onnx_sm_"))
    sm_dir = Path(str(sm_dir) + "_savedmodel")
    _, meta = export_savedmodel(model, input_shape, sm_dir, metadata=metadata,
                                dynamic_batch=dynamic_batch, dtype=dtype)
    try:
        import tf2onnx  # noqa: F401
        from tf2onnx import convert as t2o_convert
    except ImportError as e:
        raise RuntimeError(
            f"ONNX export needs the optional 'tf2onnx' + 'onnx' packages "
            f"(not installed). The TF SavedModel was written to {sm_dir} — "
            f"finish the conversion anywhere with:\n"
            f"  pip install tf2onnx onnx\n"
            f"  python -m tf2onnx.convert --saved-model {sm_dir} "
            f"--output {out_path} --opset {opset}"
        ) from e
    model_proto, _ = t2o_convert.from_saved_model(  # pragma: no cover - needs tf2onnx
        str(sm_dir), output_path=str(out_path), opset=opset)
    if simplify:  # pragma: no cover - needs onnxsim
        # reference export.py --sim (onnxsim over the emitted graph); optional
        # like tf2onnx — print the recipe instead of failing when absent
        try:
            import onnx
            from onnxsim import simplify as _onnxsim
        except ImportError:
            print(f"NOTE: --sim skipped ('onnxsim' not installed); run\n"
                  f"  pip install onnxsim && "
                  f"python -m onnxsim {out_path} {out_path}")
        else:
            simplified, ok = _onnxsim(onnx.load(str(out_path)))
            if ok:
                onnx.save(simplified, str(out_path))
            else:
                print("NOTE: onnxsim could not validate the simplified "
                      "model; keeping the unsimplified export")
    out_path.with_suffix(out_path.suffix + ".json").write_text(json.dumps(meta))
    return out_path, meta


def export_tflite(model, input_shape, out_path, metadata=None, dtype=None,
                  quantize: str | None = None):
    """Export a ClassificationModel to a ``.tflite`` flatbuffer (static batch —
    TFLite's preferred shape model; the edge-deployment analog of the
    reference's ONNX path, reference export.py:146-206). A JSON metadata
    sidecar is written next to the flatbuffer, mirroring the reference's
    embedded metadata (export.py:126-135).

    ``quantize="dynamic"`` enables dynamic-range int8 weight quantization
    (the reference's TensorRT-FP16 analog for edge targets: ~4x smaller
    flatbuffer, float activations)."""
    import jax.numpy as jnp
    import tensorflow as tf
    from jax.experimental import jax2tf

    from nkbx.export.stablehlo import make_metadata

    dtype = dtype or jnp.float32
    variables = jax.device_get(model.variables)
    module = model.module
    if getattr(getattr(module, "backbone", None), "dtype", None) == jnp.bfloat16:
        raise ValueError(
            "TFLite has no bf16 kernels (bf16 modules fail to legalize); "
            "rebuild the model with dtype=float32 — export.py does this "
            "automatically for --to tflite"
        )

    def infer(x):
        return module.apply(variables, x.astype(dtype), train=False)

    b, h, w, c = input_shape
    tf_fn = tf.function(
        jax2tf.convert(infer),
        autograph=False,
        input_signature=[tf.TensorSpec([b, h, w, c], tf.float32, name="images")],
    )
    from nkbx.ops.attention import disable_fused

    with disable_fused():  # tracing happens here; Pallas isn't TF-portable
        converter = tf.lite.TFLiteConverter.from_concrete_functions(
            [tf_fn.get_concrete_function()])
    # jax2tf emits some ops outside the builtin-TFLite set; allow TF fallback
    # kernels (the standard jax2tf->TFLite recipe)
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    if quantize == "dynamic":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    elif quantize:
        raise ValueError(f"unknown quantize mode {quantize!r}; have: 'dynamic'")
    flatbuffer = converter.convert()
    out_path = Path(out_path)
    out_path.write_bytes(flatbuffer)
    meta = metadata or make_metadata(model.classes, input_shape, model.task)
    out_path.with_suffix(out_path.suffix + ".json").write_text(json.dumps(meta))
    return out_path, meta
