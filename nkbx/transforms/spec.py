"""Transform specs + Compose.

Names/parameters mirror the albumentations ops used by the reference configs
(configs/singletask_config.py:162-219, configs/trtconfig.py) so existing pipelines
port by changing only the import. Implementation is brand-new:

- host-stage geometry: numpy/cv2 per-sample (nkbx/transforms/host.py);
- device-stage randomness: one fused batched jitted kernel (nkbx/transforms/device.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import numpy as np

HOST = "host"
DEVICE = "device"
MARKER = "marker"


def _as_range(limit, symmetric=True) -> Tuple[float, float]:
    """Albumentations-style limit: scalar x -> (-x, x); tuple kept (sorted)."""
    if isinstance(limit, (tuple, list)):
        lo, hi = float(limit[0]), float(limit[1])
        return (min(lo, hi), max(lo, hi))
    x = float(limit)
    return (-x, x) if symmetric else (0.0, x)


@dataclasses.dataclass
class Transform:
    stage = HOST

    def __post_init__(self):
        pass


# ---------------------------------------------------------------------------
# Host-stage (deterministic or per-sample-random geometry; runs in loader workers)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LongestMaxSize(Transform):
    """Resize so the longest side equals ``max_size``, keeping aspect ratio."""

    max_size: int = 1024
    interpolation: int = 1  # cv2.INTER_LINEAR
    always_apply: bool = True
    p: float = 1.0
    stage = HOST

    def out_size(self, h, w):
        scale = self.max_size / max(h, w)
        return max(1, round(h * scale)), max(1, round(w * scale))


@dataclasses.dataclass
class SmallestMaxSize(Transform):
    max_size: int = 1024
    interpolation: int = 1
    always_apply: bool = True
    p: float = 1.0
    stage = HOST

    def out_size(self, h, w):
        scale = self.max_size / min(h, w)
        return max(1, round(h * scale)), max(1, round(w * scale))


@dataclasses.dataclass
class PadIfNeeded(Transform):
    """Center-pad to at least (min_height, min_width) with a constant value."""

    min_height: int = 1024
    min_width: int = 1024
    border_mode: int = 0  # constant
    value: Union[int, Sequence[int]] = 0
    always_apply: bool = True
    p: float = 1.0
    stage = HOST


@dataclasses.dataclass
class Resize(Transform):
    height: int = 224
    width: int = 224
    interpolation: int = 1
    always_apply: bool = True
    p: float = 1.0
    stage = HOST


@dataclasses.dataclass
class CenterCrop(Transform):
    height: int = 224
    width: int = 224
    always_apply: bool = True
    p: float = 1.0
    stage = HOST


@dataclasses.dataclass
class RandomCrop(Transform):
    height: int = 224
    width: int = 224
    always_apply: bool = True
    p: float = 1.0
    stage = HOST


# ---------------------------------------------------------------------------
# Device-stage (random photometric / flips / dropout / normalize; fused on TPU)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class HorizontalFlip(Transform):
    p: float = 0.5
    stage = DEVICE


@dataclasses.dataclass
class VerticalFlip(Transform):
    p: float = 0.5
    stage = DEVICE


@dataclasses.dataclass
class RandomBrightnessContrast(Transform):
    """img <- clip(img * alpha + beta * 255), alpha~U(1+c_lo,1+c_hi), beta~U(b_lo,b_hi)."""

    brightness_limit: Union[float, Tuple[float, float]] = 0.2
    contrast_limit: Union[float, Tuple[float, float]] = 0.2
    brightness_by_max: bool = True
    p: float = 0.5
    stage = DEVICE

    def ranges(self):
        return _as_range(self.brightness_limit), _as_range(self.contrast_limit)


@dataclasses.dataclass
class HueSaturationValue(Transform):
    """Random shifts in cv2-uint8 HSV space (H in [0,180), S/V in [0,255])."""

    hue_shift_limit: Union[float, Tuple[float, float]] = 20
    sat_shift_limit: Union[float, Tuple[float, float]] = 30
    val_shift_limit: Union[float, Tuple[float, float]] = 20
    p: float = 0.5
    stage = DEVICE

    def ranges(self):
        return (
            _as_range(self.hue_shift_limit),
            _as_range(self.sat_shift_limit),
            _as_range(self.val_shift_limit),
        )


@dataclasses.dataclass
class CoarseDropout(Transform):
    """Cut out N random rectangles filled with ``fill_value``.

    Fractional hole sizes (<1.0) are relative to image H/W, matching
    albumentations.
    """

    max_holes: int = 8
    min_holes: Optional[int] = None
    max_height: Union[int, float] = 8
    min_height: Optional[Union[int, float]] = None
    max_width: Union[int, float] = 8
    min_width: Optional[Union[int, float]] = None
    fill_value: Union[int, float, Sequence[float]] = 0
    p: float = 0.5
    stage = DEVICE

    def resolved(self, img_h: int, img_w: int):
        min_holes = self.max_holes if self.min_holes is None else self.min_holes
        min_h = self.max_height if self.min_height is None else self.min_height
        min_w = self.max_width if self.min_width is None else self.min_width

        def _px(v, dim):
            return float(v) * dim if isinstance(v, float) and v <= 1.0 else float(v)

        return (
            int(min_holes),
            int(self.max_holes),
            _px(min_h, img_h),
            _px(self.max_height, img_h),
            _px(min_w, img_w),
            _px(self.max_width, img_w),
        )


@dataclasses.dataclass
class Rotate(Transform):
    """Random rotation by U(-limit, limit) degrees about the image center
    (albumentations Rotate: bilinear sampling, cv2.getRotationMatrix2D center
    (w/2-0.5, h/2-0.5); border 'reflect101' (the cv2 default) or 'constant'
    filled with ``value``)."""

    limit: Union[float, Tuple[float, float]] = 90
    border_mode: str = "reflect101"  # "reflect101" | "constant"
    value: float = 0.0
    p: float = 0.5
    stage = DEVICE

    def range(self):
        return _as_range(self.limit)


@dataclasses.dataclass
class ShiftScaleRotate(Transform):
    """Random affine: translate by U(-shift,shift)*dim, scale by
    1+U(-s,s), rotate by U(-r,r) degrees (albumentations ShiftScaleRotate
    semantics, bilinear)."""

    shift_limit: Union[float, Tuple[float, float]] = 0.0625
    scale_limit: Union[float, Tuple[float, float]] = 0.1
    rotate_limit: Union[float, Tuple[float, float]] = 45
    border_mode: str = "reflect101"
    value: float = 0.0
    p: float = 0.5
    stage = DEVICE

    def ranges(self):
        return (_as_range(self.shift_limit), _as_range(self.scale_limit),
                _as_range(self.rotate_limit))


@dataclasses.dataclass
class RandAugment(Transform):
    """torchvision RandAugment policy, run fully on-device: per sample,
    ``num_ops`` ops drawn uniformly from the 14-op set (identity, shear x/y,
    translate x/y, rotate, brightness, color, contrast, sharpness, posterize,
    solarize, autocontrast, equalize) at ``magnitude`` of
    ``num_magnitude_bins`` (torchvision ranges; sign-symmetric pointwise ops
    get a random sign per sample). Affine sub-ops are applied through
    ``num_affine_grids`` batch-shared warp grids per round, each an
    independent (op, sign) draw: per-sample marginals are exactly
    torchvision's, with within-batch support limited to K grids (shared
    grids gather wide rows; per-sample grids are point gathers the TPU
    backend lowers ~47x slower, PERF.md). ``num_ops > 1`` rounds run under
    ``lax.scan`` (one compiled round body). Sampling is NEAREST and shears
    anchor at the top-left, matching torchvision's defaults."""

    num_ops: int = 2
    magnitude: int = 9
    num_magnitude_bins: int = 31
    num_affine_grids: int = 4
    p: float = 1.0
    stage = DEVICE

    def __post_init__(self):
        if self.num_magnitude_bins < 2:
            raise ValueError("num_magnitude_bins must be >= 2")
        if not (0 <= self.magnitude < self.num_magnitude_bins):
            raise ValueError(
                f"magnitude {self.magnitude} outside [0, {self.num_magnitude_bins})")


@dataclasses.dataclass
class TrivialAugmentWide(Transform):
    """torchvision TrivialAugmentWide on-device: ONE op per image from the
    14-op table at a PER-IMAGE uniformly random magnitude bin with the wide
    ranges (shear 0.99, translate 32 px, rotate 135, color 0.99). Pointwise
    magnitudes are exactly per-sample; affine magnitudes are bucketed over
    ``num_affine_grids`` batch-shared warp grids (exact per-sample marginals,
    K-limited within-batch support — see RandAugment)."""

    num_magnitude_bins: int = 31
    num_affine_grids: int = 4
    p: float = 1.0
    stage = DEVICE

    def __post_init__(self):
        if self.num_magnitude_bins < 2:
            raise ValueError("num_magnitude_bins must be >= 2")


@dataclasses.dataclass
class MotionBlur(Transform):
    """Random directional blur with odd kernel size in [3, blur_limit].

    ``allow_shifted`` (albumentations parity, default True there too): the
    blur line may sit off the kernel center — visually the blurred content
    also shifts by up to (k-1)/2 px. False pins the line to the center.
    """

    blur_limit: Union[int, Tuple[int, int]] = 7
    allow_shifted: bool = True
    p: float = 0.5
    stage = DEVICE

    def __post_init__(self):
        if not self.ksizes():
            raise ValueError(
                f"MotionBlur(blur_limit={self.blur_limit!r}) contains no odd "
                "kernel size >= 3"
            )

    def ksizes(self):
        lim = self.blur_limit
        lo, hi = (3, lim) if isinstance(lim, int) else lim
        return [k for k in range(lo, hi + 1) if k % 2 == 1 and k >= 3]


@dataclasses.dataclass
class RandomShadow(Transform):
    """Darken a random rotated-rectangle region (albumentations RandomShadow's
    polygon shadows, approximated by rotated rectangles — documented deviation)."""

    shadow_roi: Tuple[float, float, float, float] = (0.0, 0.5, 1.0, 1.0)
    num_shadows_lower: int = 1
    num_shadows_upper: int = 2
    shadow_intensity: float = 0.5
    p: float = 0.5
    stage = DEVICE


@dataclasses.dataclass
class RandomFog(Transform):
    """Blend toward white haze: out = img*(1-f) + 255*f, f ~ U(lower, upper)."""

    fog_coef_lower: float = 0.3
    fog_coef_upper: float = 1.0
    alpha_coef: float = 0.08
    p: float = 0.5
    stage = DEVICE


@dataclasses.dataclass
class RandomRain(Transform):
    """Slanted bright streaks + mild darkening (albumentations RandomRain
    approximation: streaks from thresholded noise smeared along the slant)."""

    slant_lower: int = -10
    slant_upper: int = 10
    drop_length: int = 20
    drop_width: int = 1
    drop_color: Tuple[int, int, int] = (200, 200, 200)
    blur_value: int = 7
    brightness_coefficient: float = 0.7
    rain_type: Optional[str] = None
    p: float = 0.5
    stage = DEVICE


@dataclasses.dataclass
class Normalize(Transform):
    mean: Sequence[float] = (0.485, 0.456, 0.406)
    std: Sequence[float] = (0.229, 0.224, 0.225)
    max_pixel_value: float = 255.0
    p: float = 1.0
    always_apply: bool = True
    stage = DEVICE


@dataclasses.dataclass
class ToTensorV2(Transform):
    """Layout marker for API compat. nkbx keeps NHWC (TPU-native) end to end."""

    transpose_mask: bool = False
    stage = MARKER


# ---------------------------------------------------------------------------
# Compose
# ---------------------------------------------------------------------------


class Compose:
    """A pipeline of transform specs split into host and device stages.

    The host stage is everything up to the first device-stage transform
    (deterministic geometry must come first — this matches every reference
    pipeline, where LongestMaxSize/PadIfNeeded/Resize precede the random ops).
    """

    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = [t for t in transforms if not isinstance(t, ToTensorV2)]
        split = 0
        for i, t in enumerate(self.transforms):
            if t.stage == DEVICE:
                split = i
                break
        else:
            split = len(self.transforms)
        self.host_transforms = self.transforms[:split]
        self.device_transforms = self.transforms[split:]
        for t in self.device_transforms:
            if t.stage == HOST:
                raise ValueError(
                    f"Host-stage transform {type(t).__name__} appears after a device-stage "
                    "transform; geometry must come before random photometric ops."
                )
        # Normalize is applied LAST by the device stage; random ops after it
        # would silently run in normalized space — reject that ordering
        seen_norm = False
        for t in self.device_transforms:
            if isinstance(t, Normalize):
                seen_norm = True
            elif seen_norm and t.stage == DEVICE:
                raise ValueError(
                    f"{type(t).__name__} appears after Normalize; the fused device "
                    "stage applies Normalize last, so put random ops before it."
                )
        self._device_fn = None

    # -- host stage ---------------------------------------------------------

    def host_apply(self, img: np.ndarray, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """Apply host-stage geometry to one uint8 HWC image."""
        from nkbx.transforms import host as H

        return H.apply_host(self.host_transforms, img, rng)

    def output_size(self, in_h: int = 1024, in_w: int = 768):
        """Static (H, W) the host stage produces, if inferable; else None."""
        from nkbx.transforms import host as H

        return H.infer_output_size(self.host_transforms, in_h, in_w)

    # -- device stage ---------------------------------------------------------

    def device_apply(self, batch, key, train: bool = True, out_dtype=None):
        """Apply the fused batched augmentation to a uint8 NHWC batch on device.

        Returns float32 NHWC by default; pass ``out_dtype`` (e.g. bf16, what the
        train step does) to emit the model's compute dtype straight out of the
        fused normalize — one HBM write instead of a float32 round-trip.
        ``train=False`` skips every random op, keeping only Normalize — so one
        Compose serves as its own eval pipeline when needed.
        """
        import jax.numpy as jnp

        from nkbx.transforms.device import build_device_fn

        if self._device_fn is None:
            self._device_fn = build_device_fn(self.device_transforms)
        return self._device_fn(batch, key, train,
                               jnp.float32 if out_dtype is None else out_dtype)

    # -- reference-compat single-sample call ---------------------------------

    def __call__(self, image=None, **kwargs):
        """Albumentations-compatible single-sample call: returns {'image': np.ndarray}.

        Runs host geometry + device ops on a batch of one. Slow path — intended
        for save_augs.py-style debugging, not the hot loop.
        """
        import jax
        import jax.numpy as jnp

        img = np.asarray(image)
        img = self.host_apply(img)
        out = self.device_apply(jnp.asarray(img[None]), jax.random.PRNGKey(np.random.randint(2**31)))
        return {"image": np.asarray(out[0])}
