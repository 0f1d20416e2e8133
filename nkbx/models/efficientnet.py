"""EfficientNet (B0..B3) — MBConv with SE, swish. Flax, NHWC.

Covers the reference's ``efficientnet_b0``/``efficientnet_b2`` timm usage
(BASELINE config #3, configs/archive efb2).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from nkbx.models.common import ConvBN, SqueezeExcite, global_avg_pool, make_divisible

# (expand_ratio, kernel, stride, repeats, out_channels)
_B0_SPEC: Sequence[Tuple[int, int, int, int, int]] = (
    (1, 3, 1, 1, 16),
    (6, 3, 2, 2, 24),
    (6, 5, 2, 2, 40),
    (6, 3, 2, 3, 80),
    (6, 5, 1, 3, 112),
    (6, 5, 2, 4, 192),
    (6, 3, 1, 1, 320),
)


def _round_channels(c, width_mult, divisor=8):
    return int(make_divisible(c * width_mult, divisor))


def _round_repeats(r, depth_mult):
    return int(math.ceil(r * depth_mult))


class MBConv(nn.Module):
    expand_ratio: int
    kernel: int
    strides: int
    out: int
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        inp = x.shape[-1]
        mid = inp * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = ConvBN(mid, 1, 1, act=nn.swish, dtype=self.dtype)(y, train, mask)
        y = ConvBN(mid, self.kernel, self.strides, groups=mid, act=nn.swish, dtype=self.dtype)(y, train, mask)
        y = SqueezeExcite(max(1, int(inp * self.se_ratio)), gate=nn.sigmoid,
                          act=nn.swish, dtype=self.dtype)(y)
        y = ConvBN(self.out, 1, 1, act=None, dtype=self.dtype)(y, train, mask)
        if self.strides == 1 and inp == self.out:
            y = y + x
        return y


class EfficientNet(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @property
    def num_features(self):
        return _round_channels(1280, self.width_mult)

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = ConvBN(_round_channels(32, self.width_mult), 3, 2, act=nn.swish, dtype=self.dtype)(x, train, mask)
        for expand, kernel, stride, repeats, out in _B0_SPEC:
            out_c = _round_channels(out, self.width_mult)
            for i in range(_round_repeats(repeats, self.depth_mult)):
                x = MBConv(expand, kernel, stride if i == 0 else 1, out_c, dtype=self.dtype)(x, train, mask)
        x = ConvBN(self.num_features, 1, 1, act=nn.swish, dtype=self.dtype)(x, train, mask)
        x = global_avg_pool(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        return x.astype(jnp.float32)


efficientnet_b0 = partial(EfficientNet, width_mult=1.0, depth_mult=1.0)
efficientnet_b1 = partial(EfficientNet, width_mult=1.0, depth_mult=1.1)
efficientnet_b2 = partial(EfficientNet, width_mult=1.1, depth_mult=1.2)
efficientnet_b3 = partial(EfficientNet, width_mult=1.2, depth_mult=1.4)
efficientnet_b4 = partial(EfficientNet, width_mult=1.4, depth_mult=1.8)
efficientnet_b5 = partial(EfficientNet, width_mult=1.6, depth_mult=2.2)
efficientnet_b6 = partial(EfficientNet, width_mult=1.8, depth_mult=2.6)
efficientnet_b7 = partial(EfficientNet, width_mult=2.0, depth_mult=3.1)


# ---------------------------------------------------------------------------
# EfficientNetV2 (Tan & Le 2021, table 4; timm's efficientnetv2_* follow it)
# ---------------------------------------------------------------------------

# (block, expand, kernel, stride, repeats, out_channels, se_ratio)
V2_S_SPEC: Sequence = (
    ("fused", 1, 3, 1, 2, 24, 0.0),
    ("fused", 4, 3, 2, 4, 48, 0.0),
    ("fused", 4, 3, 2, 4, 64, 0.0),
    ("mb", 4, 3, 2, 6, 128, 0.25),
    ("mb", 6, 3, 1, 9, 160, 0.25),
    ("mb", 6, 3, 2, 15, 256, 0.25),
)
V2_M_SPEC: Sequence = (
    ("fused", 1, 3, 1, 3, 24, 0.0),
    ("fused", 4, 3, 2, 5, 48, 0.0),
    ("fused", 4, 3, 2, 5, 80, 0.0),
    ("mb", 4, 3, 2, 7, 160, 0.25),
    ("mb", 6, 3, 1, 14, 176, 0.25),
    ("mb", 6, 3, 2, 18, 304, 0.25),
    ("mb", 6, 3, 1, 5, 512, 0.25),
)
V2_L_SPEC: Sequence = (
    ("fused", 1, 3, 1, 4, 32, 0.0),
    ("fused", 4, 3, 2, 7, 64, 0.0),
    ("fused", 4, 3, 2, 7, 96, 0.0),
    ("mb", 4, 3, 2, 10, 192, 0.25),
    ("mb", 6, 3, 1, 19, 224, 0.25),
    ("mb", 6, 3, 2, 25, 384, 0.25),
    ("mb", 6, 3, 1, 7, 640, 0.25),
)


class FusedMBConv(nn.Module):
    """V2 fused block (timm EdgeResidual / ConvBnAct): the 1x1 expand + k×k
    depthwise pair is replaced by ONE dense k×k conv — much better MXU
    utilization at the high-resolution early stages (the reason V2 exists)."""

    expand_ratio: int
    kernel: int
    strides: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        inp = x.shape[-1]
        if self.expand_ratio != 1:
            y = ConvBN(inp * self.expand_ratio, self.kernel, self.strides,
                       act=nn.swish, dtype=self.dtype)(x, train, mask)
            y = ConvBN(self.out, 1, 1, act=None, dtype=self.dtype)(y, train, mask)
        else:
            y = ConvBN(self.out, self.kernel, self.strides, act=nn.swish,
                       dtype=self.dtype)(x, train, mask)
        if self.strides == 1 and inp == self.out:
            y = y + x
        return y


class EfficientNetV2(nn.Module):
    spec: Sequence = V2_S_SPEC
    stem_width: int = 24
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @property
    def num_features(self):
        return 1280

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = ConvBN(self.stem_width, 3, 2, act=nn.swish, dtype=self.dtype)(x, train, mask)
        for block, expand, kernel, stride, repeats, out, se in self.spec:
            for i in range(repeats):
                s = stride if i == 0 else 1
                if block == "fused":
                    x = FusedMBConv(expand, kernel, s, out, dtype=self.dtype)(x, train, mask)
                else:
                    x = MBConv(expand, kernel, s, out, se_ratio=se, dtype=self.dtype)(x, train, mask)
        x = ConvBN(self.num_features, 1, 1, act=nn.swish, dtype=self.dtype)(x, train, mask)
        x = global_avg_pool(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        return x.astype(jnp.float32)


efficientnetv2_s = partial(EfficientNetV2, spec=V2_S_SPEC)
efficientnetv2_m = partial(EfficientNetV2, spec=V2_M_SPEC)
efficientnetv2_l = partial(EfficientNetV2, spec=V2_L_SPEC, stem_width=32)
