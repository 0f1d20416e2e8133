"""ResNet family (resnet14t / resnet18 / resnet34 / resnet50 / resnet101).

TPU-native Flax implementation of the timm ResNet variants the reference uses via
``timm.create_model(name, num_classes=0)`` (reference model.py:82-83,
configs/singletask_config.py:227 uses ``resnet14t``). NHWC layout, bf16 compute,
fp32 params/BN.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Type

import jax.numpy as jnp
from flax import linen as nn

from nkbx.models.common import ConvBN, global_avg_pool


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        residual = x
        y = ConvBN(self.features, 3, self.strides, dtype=self.dtype)(x, train, mask)
        y = ConvBN(self.features, 3, 1, act=None, dtype=self.dtype)(y, train, mask)
        if residual.shape != y.shape:
            residual = ConvBN(self.features, 1, self.strides, act=None, dtype=self.dtype, name="downsample")(x, train, mask)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        residual = x
        out = self.features * self.expansion
        y = ConvBN(self.features, 1, 1, dtype=self.dtype)(x, train, mask)
        y = ConvBN(self.features, 3, self.strides, dtype=self.dtype)(y, train, mask)
        y = ConvBN(out, 1, 1, act=None, dtype=self.dtype)(y, train, mask)
        if residual.shape != y.shape:
            residual = ConvBN(out, 1, self.strides, act=None, dtype=self.dtype, name="downsample")(x, train, mask)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block_cls: Type[nn.Module]
    stem: str = "default"  # "default" 7x7/s2 | "tiered" 3x 3x3 (timm *t variants)
    stem_width: int = 64
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @property
    def num_features(self):
        return 64 * (2 ** (len(self.stage_sizes) - 1)) * self.block_cls.expansion

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        if self.stem == "tiered":
            # timm tiered stem: three 3x3 convs, (3*w//4, w, w*2) channels
            w = self.stem_width
            x = ConvBN(3 * w // 4, 3, 2, dtype=self.dtype)(x, train, mask)
            x = ConvBN(w, 3, 1, dtype=self.dtype)(x, train, mask)
            x = ConvBN(2 * w, 3, 1, dtype=self.dtype)(x, train, mask)
        else:
            x = ConvBN(self.stem_width, 7, 2, dtype=self.dtype)(x, train, mask)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = 64 * (2**stage)
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = self.block_cls(features, strides, dtype=self.dtype)(x, train, mask)
        x = global_avg_pool(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        return x.astype(jnp.float32)


# tiny 2-stage net for tests/CI on the 1-core CPU host (not a timm name)
resnet_tiny_test = partial(ResNet, stage_sizes=(1, 1), block_cls=BasicBlock, stem_width=16)

# timm-name-compatible constructors (reference resolves these via timm)
resnet14t = partial(ResNet, stage_sizes=(1, 1, 1, 1), block_cls=Bottleneck, stem="tiered", stem_width=32)
resnet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock)
resnet26 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block_cls=Bottleneck)
resnet34 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock)
resnet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck)
resnet101 = partial(ResNet, stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck)
