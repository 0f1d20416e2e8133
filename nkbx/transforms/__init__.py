"""nkbx.transforms — TPU-first augmentation pipeline.

The reference applies per-sample albumentations CPU transforms inside DataLoader
workers (reference dataset.py:89-102 + configs/singletask_config.py:162-219). Here a
pipeline is a declarative :class:`Compose` of transform specs with the same names and
parameters, split into two stages:

- **host stage**: deterministic geometry (LongestMaxSize, PadIfNeeded, Resize,
  CenterCrop, ...) runs per-sample on CPU in loader workers, producing fixed-shape
  uint8 HWC arrays (static shapes are what XLA needs);
- **device stage**: all random photometric ops + flips + CoarseDropout + Normalize
  run as ONE fused, batched, jitted uint8 kernel on TPU (``Compose.device_apply``),
  keyed by a JAX PRNG key — replacing per-sample CPU augmentation entirely.

Usage (config files):

    import nkbx.transforms as T
    train_pipeline = T.Compose([
        T.LongestMaxSize(128),
        T.PadIfNeeded(128, 128, border_mode=0, value=0),
        T.HorizontalFlip(p=0.5),
        T.RandomBrightnessContrast(brightness_limit=(-0.2, 0.2), contrast_limit=(0.1, -0.5), p=0.5),
        T.HueSaturationValue(hue_shift_limit=0, sat_shift_limit=10, val_shift_limit=50, p=0.5),
        T.CoarseDropout(max_holes=4, min_holes=1, max_height=0.2, min_height=0.05,
                        max_width=0.2, min_width=0.05, fill_value=0, p=0.5),
        T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        T.ToTensorV2(),
    ])
"""

from nkbx.transforms.spec import (
    Compose,
    Transform,
    LongestMaxSize,
    SmallestMaxSize,
    PadIfNeeded,
    Resize,
    CenterCrop,
    RandomCrop,
    HorizontalFlip,
    VerticalFlip,
    RandomBrightnessContrast,
    HueSaturationValue,
    CoarseDropout,
    Rotate,
    ShiftScaleRotate,
    RandAugment,
    TrivialAugmentWide,
    MotionBlur,
    RandomShadow,
    RandomFog,
    RandomRain,
    Normalize,
    ToTensorV2,
)
from nkbx.transforms.adapter import Transforms

__all__ = [
    "Compose",
    "Transform",
    "Transforms",
    "LongestMaxSize",
    "SmallestMaxSize",
    "PadIfNeeded",
    "Resize",
    "CenterCrop",
    "RandomCrop",
    "HorizontalFlip",
    "VerticalFlip",
    "RandomBrightnessContrast",
    "HueSaturationValue",
    "CoarseDropout",
    "Rotate",
    "ShiftScaleRotate",
    "RandAugment",
    "TrivialAugmentWide",
    "MotionBlur",
    "RandomShadow",
    "RandomFog",
    "RandomRain",
    "Normalize",
    "ToTensorV2",
]
