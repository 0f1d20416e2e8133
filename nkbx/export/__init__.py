from nkbx.export.stablehlo import (
    export_model,
    load_exported,
    make_metadata,
    save_stablehlo_text,
)
from nkbx.export.serving import ExportedModel, TPUServingModule, default_buckets


def export_savedmodel(*args, **kwargs):
    """Lazy wrapper: tensorflow imports are heavy, load only when used."""
    from nkbx.export.savedmodel import export_savedmodel as _impl

    return _impl(*args, **kwargs)


def export_tflite(*args, **kwargs):
    """Lazy wrapper: tensorflow imports are heavy, load only when used."""
    from nkbx.export.savedmodel import export_tflite as _impl

    return _impl(*args, **kwargs)


def export_onnx(*args, **kwargs):
    """Lazy wrapper: tensorflow imports are heavy, load only when used."""
    from nkbx.export.savedmodel import export_onnx as _impl

    return _impl(*args, **kwargs)


__all__ = [
    "export_model",
    "export_onnx",
    "export_savedmodel",
    "export_tflite",
    "load_exported",
    "make_metadata",
    "save_stablehlo_text",
    "ExportedModel",
    "TPUServingModule",
    "default_buckets",
]
