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
    tf.saved_model.save(wrapper, str(save_dir))

    meta = metadata or make_metadata(model.classes, input_shape, model.task)
    (save_dir / "metadata.json").write_text(json.dumps(meta))
    (save_dir / "classes.json").write_text(json.dumps(model.classes))
    return save_dir, meta
