"""MobileNetV3 (large/small), the reference's workhorse backbone
(``mobilenetv3_large_100`` appears in 21 reference configs). Flax, NHWC.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from nkbx.models.common import ConvBN, SqueezeExcite, global_avg_pool, hard_swish, make_divisible

# (kernel, exp_size, out, use_se, activation, stride)
_LARGE_SPEC: Sequence[Tuple[int, int, int, bool, str, int]] = (
    (3, 16, 16, False, "re", 1),
    (3, 64, 24, False, "re", 2),
    (3, 72, 24, False, "re", 1),
    (5, 72, 40, True, "re", 2),
    (5, 120, 40, True, "re", 1),
    (5, 120, 40, True, "re", 1),
    (3, 240, 80, False, "hs", 2),
    (3, 200, 80, False, "hs", 1),
    (3, 184, 80, False, "hs", 1),
    (3, 184, 80, False, "hs", 1),
    (3, 480, 112, True, "hs", 1),
    (3, 672, 112, True, "hs", 1),
    (5, 672, 160, True, "hs", 2),
    (5, 960, 160, True, "hs", 1),
    (5, 960, 160, True, "hs", 1),
)

_SMALL_SPEC: Sequence[Tuple[int, int, int, bool, str, int]] = (
    (3, 16, 16, True, "re", 2),
    (3, 72, 24, False, "re", 2),
    (3, 88, 24, False, "re", 1),
    (5, 96, 40, True, "hs", 2),
    (5, 240, 40, True, "hs", 1),
    (5, 240, 40, True, "hs", 1),
    (5, 120, 48, True, "hs", 1),
    (5, 144, 48, True, "hs", 1),
    (5, 288, 96, True, "hs", 2),
    (5, 576, 96, True, "hs", 1),
    (5, 576, 96, True, "hs", 1),
)


def _act(name):
    return hard_swish if name == "hs" else nn.relu


class InvertedResidual(nn.Module):
    kernel: int
    exp_size: int
    out: int
    use_se: bool
    act_name: str
    strides: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        act = _act(self.act_name)
        inp = x.shape[-1]
        y = x
        if self.exp_size != inp:
            y = ConvBN(self.exp_size, 1, 1, act=act, dtype=self.dtype)(y, train, mask)
        y = ConvBN(self.exp_size, self.kernel, self.strides, groups=self.exp_size, act=act, dtype=self.dtype)(y, train, mask)
        if self.use_se:
            y = SqueezeExcite(make_divisible(self.exp_size // 4), dtype=self.dtype)(y)
        y = ConvBN(self.out, 1, 1, act=None, dtype=self.dtype)(y, train, mask)
        if self.strides == 1 and inp == self.out:
            y = y + x
        return y


class MobileNetV3(nn.Module):
    spec: Sequence[Tuple[int, int, int, bool, str, int]] = _LARGE_SPEC
    width_mult: float = 1.0
    last_conv: int = 960
    head_features: int = 1280
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @property
    def num_features(self):
        return self.head_features

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        wm = self.width_mult
        x = ConvBN(make_divisible(16 * wm), 3, 2, act=hard_swish, dtype=self.dtype)(x, train, mask)
        for k, e, o, se, a, s in self.spec:
            x = InvertedResidual(
                k, make_divisible(e * wm), make_divisible(o * wm), se, a, s, dtype=self.dtype
            )(x, train, mask)
        x = ConvBN(make_divisible(self.last_conv * wm), 1, 1, act=hard_swish, dtype=self.dtype)(x, train, mask)
        x = global_avg_pool(x)
        x = nn.Dense(self.head_features, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = hard_swish(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        return x.astype(jnp.float32)


mobilenetv3_large_100 = partial(MobileNetV3, spec=_LARGE_SPEC, last_conv=960, head_features=1280)
mobilenetv3_small_100 = partial(MobileNetV3, spec=_SMALL_SPEC, last_conv=576, head_features=1024)
