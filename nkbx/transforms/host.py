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

_CV2_INTERP = {0: "nearest", 1: "linear", 2: "cubic", 3: "area", 4: "lanczos"}


def _resize(img: np.ndarray, h: int, w: int, interpolation: int = 1) -> np.ndarray:
    if img.shape[0] == h and img.shape[1] == w:
        return img
    if _HAS_CV2:
        return cv2.resize(img, (w, h), interpolation=interpolation)
    # PIL fallback
    from PIL import Image

    modes = {0: Image.NEAREST, 1: Image.BILINEAR, 2: Image.BICUBIC, 3: Image.BOX, 4: Image.LANCZOS}
    return np.asarray(Image.fromarray(img).resize((w, h), modes.get(interpolation, Image.BILINEAR)))


def _pad_center(img: np.ndarray, min_h: int, min_w: int, value=0) -> np.ndarray:
    h, w = img.shape[:2]
    if h >= min_h and w >= min_w:
        return img
    pad_top = max(0, (min_h - h) // 2)
    pad_bottom = max(0, min_h - h - pad_top)
    pad_left = max(0, (min_w - w) // 2)
    pad_right = max(0, min_w - w - pad_left)
    pads = [(pad_top, pad_bottom), (pad_left, pad_right)] + [(0, 0)] * (img.ndim - 2)
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
    ih, iw = img.shape[:2]
    y1 = max(0, (ih - h) // 2)
    x1 = max(0, (iw - w) // 2)
    return img[y1:y1 + h, x1:x1 + w]


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
            img = _pad_center(img, t.min_height, t.min_width, t.value)
        elif isinstance(t, S.Resize):
            img = _resize(img, t.height, t.width, t.interpolation)
        elif isinstance(t, S.CenterCrop):
            img = _center_crop(img, t.height, t.width)
        elif isinstance(t, S.RandomCrop):
            ih, iw = img.shape[:2]
            if ih <= t.height and iw <= t.width:
                img = _center_crop(img, t.height, t.width)
            else:
                r = rng if rng is not None else np.random.default_rng()
                y1 = int(r.integers(0, max(1, ih - t.height + 1)))
                x1 = int(r.integers(0, max(1, iw - t.width + 1)))
                img = img[y1:y1 + t.height, x1:x1 + t.width]
        else:
            raise NotImplementedError(f"Host transform {type(t).__name__} not implemented")
    return np.ascontiguousarray(img)


def infer_output_size(transforms: Sequence[S.Transform], in_h: int, in_w: int):
    """Track shapes through the host chain; return (H, W) if static, else None."""
    h, w = in_h, in_w
    static_h = static_w = False
    for t in transforms:
        if isinstance(t, (S.LongestMaxSize, S.SmallestMaxSize)):
            h, w = t.out_size(h, w)
            static_h = static_w = False
        elif isinstance(t, S.PadIfNeeded):
            h, w = max(h, t.min_height), max(w, t.min_width)
            # static only if padding always reaches the minimum (i.e. prior op
            # bounded size below the pad target)
            static_h = h == t.min_height
            static_w = w == t.min_width
        elif isinstance(t, (S.Resize,)):
            h, w = t.height, t.width
            static_h = static_w = True
        elif isinstance(t, (S.CenterCrop, S.RandomCrop)):
            h, w = t.height, t.width
            static_h = static_w = True
    if static_h and static_w:
        return h, w
    # LongestMaxSize+PadIfNeeded(max,max) is the common static case
    for i, t in enumerate(transforms):
        if isinstance(t, S.LongestMaxSize):
            for t2 in transforms[i + 1:]:
                if isinstance(t2, S.PadIfNeeded) and t2.min_height >= t.max_size and t2.min_width >= t.max_size:
                    return t2.min_height, t2.min_width
    return None
