from nkbx.export.stablehlo import (
    export_model,
    load_exported,
    make_metadata,
    save_stablehlo_text,
)
from nkbx.export.serving import ExportedModel, TPUServingModule, default_buckets

__all__ = [
    "export_model",
    "load_exported",
    "make_metadata",
    "save_stablehlo_text",
    "ExportedModel",
    "TPUServingModule",
    "default_buckets",
]
