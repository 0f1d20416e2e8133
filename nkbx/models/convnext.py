"""ConvNeXt (tiny/small/base). Flax, NHWC, layer-scale, GELU.

Covers the reference's ``convnext_base`` timm usage and BASELINE config #2
(ConvNeXt-Tiny).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from nkbx.models.common import global_avg_pool


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(
            self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.gelu(y, approximate=False)  # timm uses exact GELU
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(y)
        gamma = self.param("layer_scale", nn.initializers.constant(self.layer_scale_init), (self.dim,))
        return x + y * gamma.astype(y.dtype)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @property
    def num_features(self):
        return self.dims[-1]

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):  # mask unused: no batch statistics
        # patchify stem: 4x4 conv stride 4 + LN
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype, param_dtype=jnp.float32)(x)
            for _ in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype)(x, train)
        x = global_avg_pool(x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="head_norm")(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        return x.astype(jnp.float32)


convnext_tiny = partial(ConvNeXt, depths=(3, 3, 9, 3), dims=(96, 192, 384, 768))
convnext_small = partial(ConvNeXt, depths=(3, 3, 27, 3), dims=(96, 192, 384, 768))
convnext_base = partial(ConvNeXt, depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024))
convnext_large = partial(ConvNeXt, depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536))
