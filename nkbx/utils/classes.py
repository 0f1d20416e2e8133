"""Class-name persistence and index mapping.

Same semantics as reference ``nkb_classification/utils.py:64-98``: classes are a
list (single-task) or a ``{target_name: [class, ...]}`` dict (multi-task); they are
saved to ``classes.json`` per run and mapped to/from contiguous indices.
"""

from __future__ import annotations

import json
from pathlib import Path


def save_classes(classes, save_path):
    if isinstance(classes, (list, dict)):
        with open(save_path, "w") as f:
            json.dump(classes, f)
    else:
        raise NotImplementedError(f"unknown classes config type {type(classes)}")


def load_classes(classes):
    """Pass through list/dict, or load from a JSON file path."""
    if isinstance(classes, (list, dict)):
        return classes
    if isinstance(classes, (str, Path)):
        with open(classes, "r") as f:
            return json.load(f)
    raise NotImplementedError(f"unknown classes config type {type(classes)}")


def get_classes_configs(classes):
    """Return (class_to_idx, idx_to_class) for a list or per-target dict."""
    if isinstance(classes, list):
        class_to_idx = {cls: idx for idx, cls in enumerate(classes)}
        idx_to_class = {idx: cls for cls, idx in class_to_idx.items()}
        return class_to_idx, idx_to_class
    if isinstance(classes, dict):
        class_to_idx = {t: {cls: i for i, cls in enumerate(cs)} for t, cs in classes.items()}
        idx_to_class = {t: {i: cls for cls, i in m.items()} for t, m in class_to_idx.items()}
        return class_to_idx, idx_to_class
    raise NotImplementedError(f"unknown classes config type {type(classes)}")
