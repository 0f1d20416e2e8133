"""Host-stage geometry: per-sample numpy/cv2 ops run inside loader workers.

These are the deterministic (or per-sample random) shape-changing transforms that
must run before batching so the device stage sees static shapes. Semantics match
the albumentations ops the reference configs use (LongestMaxSize, PadIfNeeded,
Resize, CenterCrop — configs/singletask_config.py:162-219).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from nkbx.transforms import spec as S

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

# cv2 border_mode -> np.pad mode (cv2.BORDER_CONSTANT/REPLICATE/REFLECT/WRAP/
# REFLECT_101; np 'reflect' == cv2 REFLECT_101, np 'symmetric' == cv2 REFLECT)
_PAD_MODES = {0: "constant", 1: "edge", 2: "symmetric", 3: "wrap", 4: "reflect"}


def _resize(img: np.ndarray, h: int, w: int, interpolation: int = 1) -> np.ndarray:
    if img.shape[0] == h and img.shape[1] == w:
        return img
    if _HAS_CV2:
        return cv2.resize(img, (w, h), interpolation=interpolation)
    # PIL fallback
    from PIL import Image

    modes = {0: Image.NEAREST, 1: Image.BILINEAR, 2: Image.BICUBIC, 3: Image.BOX, 4: Image.LANCZOS}
    return np.asarray(Image.fromarray(img).resize((w, h), modes.get(interpolation, Image.BILINEAR)))


def _pad_center(img: np.ndarray, min_h: int, min_w: int, value=0, border_mode: int = 0) -> np.ndarray:
    h, w = img.shape[:2]
    if h >= min_h and w >= min_w:
        return img
    pad_top = max(0, (min_h - h) // 2)
    pad_bottom = max(0, min_h - h - pad_top)
    pad_left = max(0, (min_w - w) // 2)
    pad_right = max(0, min_w - w - pad_left)
    pads = [(pad_top, pad_bottom), (pad_left, pad_right)] + [(0, 0)] * (img.ndim - 2)
    mode = _PAD_MODES.get(border_mode, "constant")
    if mode != "constant":
        return np.pad(img, pads, mode=mode)
    if np.isscalar(value):
        return np.pad(img, pads, mode="constant", constant_values=value)
    out = np.pad(img, pads, mode="constant")
    val = np.asarray(value, dtype=img.dtype)
    if pad_top:
        out[:pad_top] = val
    if pad_bottom:
        out[out.shape[0] - pad_bottom:] = val
    if pad_left:
        out[:, :pad_left] = val
    if pad_right:
        out[:, out.shape[1] - pad_right:] = val
    return out


def _center_crop(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Center-crop to exactly (h, w); inputs smaller along an axis are
    zero-padded (the host stage must emit static shapes — CLAUDE.md)."""
    ih, iw = img.shape[:2]
    y1 = max(0, (ih - h) // 2)
    x1 = max(0, (iw - w) // 2)
    img = img[y1:y1 + h, x1:x1 + w]
    if img.shape[0] != h or img.shape[1] != w:
        img = _pad_center(img, h, w, 0)
    return img


def apply_host(transforms: Sequence[S.Transform], img: np.ndarray,
               rng: Optional[np.random.Generator] = None) -> np.ndarray:
    img = np.ascontiguousarray(img)
    for t in transforms:
        if isinstance(t, S.LongestMaxSize):
            h, w = t.out_size(img.shape[0], img.shape[1])
            img = _resize(img, h, w, t.interpolation)
        elif isinstance(t, S.SmallestMaxSize):
            h, w = t.out_size(img.shape[0], img.shape[1])
            img = _resize(img, h, w, t.interpolation)
        elif isinstance(t, S.PadIfNeeded):
            img = _pad_center(img, t.min_height, t.min_width, t.value, t.border_mode)
        elif isinstance(t, S.Resize):
            img = _resize(img, t.height, t.width, t.interpolation)
        elif isinstance(t, S.CenterCrop):
            img = _center_crop(img, t.height, t.width)
        elif isinstance(t, S.RandomCrop):
            ih, iw = img.shape[:2]
            r = rng if rng is not None else np.random.default_rng()
            y1 = int(r.integers(0, max(1, ih - t.height + 1)))
            x1 = int(r.integers(0, max(1, iw - t.width + 1)))
            img = img[y1:y1 + t.height, x1:x1 + t.width]
            if img.shape[0] != t.height or img.shape[1] != t.width:
                # smaller input along an axis: pad to the static crop size
                img = _pad_center(img, t.height, t.width, 0)
        else:
            raise NotImplementedError(f"Host transform {type(t).__name__} not implemented")
    return np.ascontiguousarray(img)


def infer_output_size(transforms: Sequence[S.Transform], in_h: int = None, in_w: int = None):
    """Return the static (H, W) the host chain produces for ARBITRARY inputs,
    or None if the output shape depends on the input.

    Tracks per-axis state: ``exact`` value (shape is a fixed number regardless
    of input) or an ``upper bound`` (e.g. LongestMaxSize bounds both axes by
    max_size); PadIfNeeded makes an axis exact only when the incoming bound is
    <= the pad minimum.
    """
    # (exact_h, exact_w): fixed sizes or None; (bound_h, bound_w): upper bounds or None
    exact = [None, None]
    bound = [None, None]
    for t in transforms:
        if isinstance(t, S.LongestMaxSize):
            exact = [None, None]
            bound = [t.max_size, t.max_size]
        elif isinstance(t, S.SmallestMaxSize):
            exact = [None, None]
            bound = [None, None]  # longest side is unbounded
        elif isinstance(t, S.Resize):
            exact = [t.height, t.width]
            bound = [t.height, t.width]
        elif isinstance(t, (S.CenterCrop, S.RandomCrop)):
            # crops pad smaller inputs, so the output is always exact
            exact = [t.height, t.width]
            bound = [t.height, t.width]
        elif isinstance(t, S.PadIfNeeded):
            mins = (t.min_height, t.min_width)
            for ax in range(2):
                if exact[ax] is not None:
                    exact[ax] = max(exact[ax], mins[ax])
                    bound[ax] = exact[ax]
                elif bound[ax] is not None and bound[ax] <= mins[ax]:
                    exact[ax] = mins[ax]
                    bound[ax] = mins[ax]
                # else: still input-dependent on this axis
    if exact[0] is not None and exact[1] is not None:
        return exact[0], exact[1]
    return None
