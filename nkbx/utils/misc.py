"""Small helpers mirroring reference ``nkb_classification/utils.py:108-137``."""

from __future__ import annotations

import numpy as np


def sort_df_columns_titled(df):
    """Keep the first column in place, sort the rest alphabetically.

    Used for the tab-separated ``metrics.csv`` (reference logging.py:33).
    """
    import pandas as pd

    first_column = df.iloc[:, 0]
    other_sorted = df.iloc[:, 1:].reindex(sorted(df.columns[1:]), axis=1)
    return pd.concat([first_column, other_sorted], axis=1)


def convert_dict_types_recursive(d):
    """ndarray / jax array / numpy scalar → plain Python, for JSON dumps."""
    for key in d:
        v = d[key]
        if isinstance(v, dict):
            d[key] = convert_dict_types_recursive(v)
        elif isinstance(v, np.ndarray):
            d[key] = v.tolist()
        elif isinstance(v, (np.floating, np.integer)):
            d[key] = v.item()
        elif hasattr(v, "__array__") and not isinstance(v, (list, str, float, int, bool, type(None))):
            d[key] = np.asarray(v).tolist()
    return d


def export_formats():
    """Supported deployment formats (TPU-native replacements of export.py:124-137)."""
    import pandas

    x = [
        ["Orbax checkpoint", "-", "", True, True],
        ["StableHLO", "stablehlo", ".stablehlo", True, True],
        ["TPU serving bundle", "serving", ".nkbx", True, True],
        ["TF SavedModel (jax2tf)", "savedmodel", "_savedmodel/", True, True],
        ["TFLite flatbuffer (+int8)", "tflite", ".tflite", True, False],
        ["ONNX (SavedModel + tf2onnx)", "onnx", ".onnx", True, False],
    ]
    return pandas.DataFrame(x, columns=["Format", "Argument", "Suffix", "CPU", "TPU"])
