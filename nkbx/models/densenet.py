"""DenseNet (121/169/201) — dense blocks with pre-activation BN. Flax, NHWC.

TPU-native equivalent of the torchvision/timm DenseNet the reference reaches
via ``timm.create_model(name, num_classes=0)`` (reference model.py:82-83).
Layer order follows torchvision densenet.py `_DenseLayer`: each layer consumes
the channel-concat of every previous feature map, applies
norm1->relu->conv1(1x1, 4*growth)->norm2->relu->conv2(3x3, growth), and its
output is concatenated onto the running features. Transitions are
norm->relu->conv1x1(halve)->avgpool2. bf16 compute, fp32 params/BN.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from nkbx.models.common import TorchBatchNorm, global_avg_pool


class _BNReluConv(nn.Module):
    """Pre-activation BN -> relu -> conv (torchvision DenseNet building step)."""

    features: int
    kernel_size: int = 1
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = TorchBatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="BatchNorm_0")(x, mask=mask if train else None)
        x = nn.relu(x)
        k = self.kernel_size
        return nn.Conv(self.features, (k, k), strides=(self.strides, self.strides),
                       padding=((k // 2, k // 2), (k // 2, k // 2)), use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32, name="Conv_0")(x)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.float32
    emit_only: bool = False  # return just the growth channels (buffer mode)

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        y = _BNReluConv(self.bn_size * self.growth_rate, 1, dtype=self.dtype,
                        name="bottleneck")(x, train, mask)
        y = _BNReluConv(self.growth_rate, 3, dtype=self.dtype,
                        name="conv")(y, train, mask)
        if self.emit_only:
            return y
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    block_config: Sequence[int]
    growth_rate: int = 32
    init_features: int = 64
    drop_rate: float = 0.0
    dtype: Any = jnp.float32
    # buffer_concat: grow each dense block inside ONE preallocated
    # (B, H, W, C_block_end) buffer via static .at[].set slice updates instead
    # of a per-layer jnp.concatenate. Numerically identical (same values, same
    # param tree — tests/test_models.py). MEASURED NEGATIVE on TPU (−43%:
    # 61.7 vs 34.95 ms/step, experiments/r5_densenet_buffer.py): XLA does NOT
    # alias lane-minor slice updates at 32-channel offsets — each .at[].set
    # re-copies the whole buffer, costing more than the concat stores it was
    # meant to remove. Kept as a tested conclusion (PERF.md round-5 densenet
    # section); the per-layer concatenate default is the fastest lowering.
    buffer_concat: bool = False

    @property
    def num_features(self):
        c = self.init_features
        for i, n in enumerate(self.block_config):
            c += n * self.growth_rate
            if i != len(self.block_config) - 1:
                c //= 2
        return c

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = nn.Conv(self.init_features, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem_conv")(x.astype(self.dtype))
        x = TorchBatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="stem_norm")(x, mask=mask if train else None)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_layers in enumerate(self.block_config):
            if self.buffer_concat:
                c = x.shape[-1]
                buf = jnp.zeros(
                    x.shape[:-1] + (c + n_layers * self.growth_rate,), x.dtype)
                buf = buf.at[..., :c].set(x)
                for j in range(n_layers):
                    y = DenseLayer(self.growth_rate, dtype=self.dtype,
                                   emit_only=True, name=f"block{i}_layer{j}")(
                                       buf[..., :c], train, mask)
                    buf = buf.at[..., c:c + self.growth_rate].set(y)
                    c += self.growth_rate
                x = buf
            else:
                for j in range(n_layers):
                    x = DenseLayer(self.growth_rate, dtype=self.dtype,
                                   name=f"block{i}_layer{j}")(x, train, mask)
            if i != len(self.block_config) - 1:
                x = _BNReluConv(x.shape[-1] // 2, 1, dtype=self.dtype,
                                name=f"transition{i}")(x, train, mask)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = TorchBatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="final_norm")(x, mask=mask if train else None)
        x = nn.relu(x)
        x = global_avg_pool(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        return x.astype(jnp.float32)


densenet121 = partial(DenseNet, block_config=(6, 12, 24, 16))
densenet169 = partial(DenseNet, block_config=(6, 12, 32, 32))
densenet201 = partial(DenseNet, block_config=(6, 12, 48, 32))
