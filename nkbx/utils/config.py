"""Python-module config system.

Configs are executable Python modules, same public surface as the reference
(``nkb_classification/utils.py:101-105`` + ``train.py:92``): a config file declares
module-level attributes (``task``, ``train_data``, ``train_pipeline``, ``model``,
``optimizer``, ``lr_policy``, ``criterion``, ``experiment``, ``n_epochs``, ...).

Unlike the reference — which returns an ``import`` statement string for the caller to
``exec()`` — we load the module directly and wrap it in a :class:`Config` view that
provides attribute access with defaults and accepts both the correct and the
reference's typo'd precision key (``enable_mixed_presicion``).
"""

from __future__ import annotations

import hashlib
import importlib.util
import sys
import types
from pathlib import Path


# Defaults for optional config attributes. Mirrors the documented knobs of
# reference configs/singletask_config.py:1-254.
_DEFAULTS = {
    "device": None,  # None => let JAX pick (TPU if present)
    "enable_mixed_precision": True,  # bf16 compute on TPU; no GradScaler needed
    "compile": True,  # everything is jitted; kept for config compat
    "log_gradients": False,
    "show_full_current_loss_in_terminal": False,
    "show_all_classes_in_confusion_matrix": False,
    "backbone_state_policy": {},
    "lr_policy": {},
    "n_epochs": 1,
    "seed": 0,
    "mesh": None,  # optional dict: {"data": N} / {"data": N, "model": M}
}

# Every knob any nkbx entry point reads (configs may define extra helper
# variables freely — only NEAR-MISSES of these names are warned about, e.g.
# ``model_ema`` for ``model_ema_decay``, which would otherwise be silently
# ignored by the getattr-with-default pattern).
_KNOWN_KEYS = frozenset(_DEFAULTS) | {
    "enable_mixed_presicion", "experiment_name", "experiment", "task",
    "train_data", "val_data", "inference_data", "train_pipeline",
    "val_pipeline", "inference_pipeline", "model", "optimizer", "criterion",
    "target_names", "metrics_accumulation", "mixup", "model_ema_decay",
    "steps_per_dispatch", "grad_accum_steps", "fsdp", "export_serving",
    "enable_nan_debugging", "debug_nans", "save_path",
}


class Config:
    """Attribute view over a loaded config module (or a plain dict).

    Accessing a missing attribute falls back to :data:`_DEFAULTS`; the reference
    typo ``enable_mixed_presicion`` is accepted as an alias of
    ``enable_mixed_precision`` (see reference configs/singletask_config.py:6).
    """

    def __init__(self, source):
        if isinstance(source, dict):
            self._ns = dict(source)
        elif isinstance(source, types.ModuleType):
            self._ns = {k: v for k, v in vars(source).items() if not k.startswith("__")}
        elif isinstance(source, Config):
            self._ns = dict(source._ns)
        else:
            raise TypeError(f"Cannot build Config from {type(source)}")
        # normalize the typo'd key both ways so either spelling works
        if "enable_mixed_presicion" in self._ns and "enable_mixed_precision" not in self._ns:
            self._ns["enable_mixed_precision"] = self._ns["enable_mixed_presicion"]
        if "enable_mixed_precision" in self._ns:
            self._ns.setdefault("enable_mixed_presicion", self._ns["enable_mixed_precision"])
        self._warn_near_miss_keys()

    def _warn_near_miss_keys(self):
        """Warn when a config name looks like a typo of a real knob.

        Unknown names are otherwise read-with-default and silently ignored
        (configs legitimately define helper variables, so only CLOSE matches
        of known keys are flagged — e.g. ``model_ema`` vs ``model_ema_decay``).
        """
        import difflib
        import warnings

        for key in self._ns:
            if key in _KNOWN_KEYS or not isinstance(key, str):
                continue
            close = difflib.get_close_matches(key, _KNOWN_KEYS, n=1, cutoff=0.75)
            prefix = [k for k in _KNOWN_KEYS
                      if len(key) >= 5 and k.startswith(key) and k != key]
            hit = close or sorted(prefix)
            if hit:
                warnings.warn(
                    f"Config key {key!r} is not a known nkbx knob but is close "
                    f"to {hit[0]!r} — it would be silently ignored; did you "
                    f"mean {hit[0]!r}?")

    def __getattr__(self, name):
        ns = object.__getattribute__(self, "_ns")
        if name in ns:
            return ns[name]
        if name in _DEFAULTS:
            return _DEFAULTS[name]
        raise AttributeError(f"Config has no attribute {name!r}")

    def __contains__(self, name):
        """True only for keys the USER set (defaults are reachable via
        attribute access / get, but presence checks must distinguish)."""
        return name in self._ns

    _MISSING = object()

    def get(self, name, default=_MISSING):
        """User value > caller's explicit default > framework default."""
        if name in self._ns:
            return self._ns[name]
        if default is not Config._MISSING:
            return default
        return _DEFAULTS.get(name)

    def __setattr__(self, name, value):
        if name == "_ns":
            object.__setattr__(self, name, value)
        else:
            self._ns[name] = value

    def asdict(self):
        return dict(self._ns)

    def __repr__(self):
        return f"Config({sorted(self._ns)})"


def load_config(path) -> Config:
    """Load a Python config file as a :class:`Config`.

    The config's directory is added to ``sys.path`` so configs may import sibling
    modules (matching the reference's behavior, utils.py:101-105).
    """
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Config file not found: {path}")
    parent = str(path.parent.resolve())
    if parent not in sys.path:
        sys.path.append(parent)
    # unique module name per file, so two configs sharing a stem (or a stem
    # colliding with an installed module) never alias each other in sys.modules
    digest = hashlib.md5(str(path.resolve()).encode()).hexdigest()[:8]
    mod_name = f"nkbx_cfg_{path.stem}_{digest}"
    spec = importlib.util.spec_from_file_location(mod_name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = module  # dataclasses/pickling inside configs resolve
    spec.loader.exec_module(module)
    return Config(module)


def read_py_config(path):
    """Reference-compatible helper (utils.py:101-105): returns an import line.

    Kept so external scripts written against the reference API keep working; new
    code should call :func:`load_config`.
    """
    path = Path(path)
    sys.path.append(str(path.parent))
    return f"import {path.stem} as cfg"
