"""ConvNeXt (tiny/small/base). Flax, NHWC, layer-scale, GELU.

Covers the reference's ``convnext_base`` timm usage and BASELINE config #2
(ConvNeXt-Tiny).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from nkbx.models.common import global_avg_pool, mlp_tail


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32
    fused_mlp: Any = None  # None=auto (TPU) | True | False — see nkbx/ops/mlp.py

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(
            self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        # LN + mixing Denses + layer-scale + residual: params declared
        # flax-identically either way (checkpoint/converter-compatible);
        # on TPU the whole tail lowers to ONE fused VMEM kernel per pass
        # (nkbx/ops/mlp.py fused_ln_mlp: LN stats, GELU intermediates, and
        # the residual never make separate HBM round trips — PERF.md r3).
        gamma = self.param("layer_scale", nn.initializers.constant(self.layer_scale_init), (self.dim,))
        return mlp_tail(y, x, 4 * self.dim, ln_name="LayerNorm_0",
                        fc_names=("Dense_0", "Dense_1"), eps=1e-6,
                        dtype=self.dtype, flag=self.fused_mlp, gamma=gamma)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_rate: float = 0.0
    dtype: Any = jnp.float32
    # Stage indices whose blocks run under jax.checkpoint (nn.remat): trades
    # recompute FLOPs for saved-activation HBM traffic. ConvNeXt stores 2x
    # (4*dim)-wide GELU intermediates per block for the backward, so remat is
    # a bigger lever here than for ResNet (r3 convnext remat sweep, PERF.md).
    remat_stages: Sequence[int] = ()
    fused_mlp: Any = None  # None=auto (TPU) | True | False — see nkbx/ops/mlp.py

    @property
    def num_features(self):
        return self.dims[-1]

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):  # mask unused: no batch statistics
        # patchify stem: 4x4 conv stride 4 + LN
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        # blocks keep the un-wrapped class's auto-name pattern so param paths
        # (and checkpoints) are identical across remat_stages settings; train
        # (arg 2) is static under remat
        remat_cls = (nn.remat(ConvNeXtBlock, static_argnums=(2,))
                     if self.remat_stages else None)
        block_i = 0
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype, param_dtype=jnp.float32)(x)
            cls = remat_cls if stage in self.remat_stages else ConvNeXtBlock
            for _ in range(depth):
                x = cls(dim, dtype=self.dtype, fused_mlp=self.fused_mlp,
                        name=f"ConvNeXtBlock_{block_i}")(x, train)
                block_i += 1
        x = global_avg_pool(x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="head_norm")(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        return x.astype(jnp.float32)


convnext_tiny = partial(ConvNeXt, depths=(3, 3, 9, 3), dims=(96, 192, 384, 768))
convnext_small = partial(ConvNeXt, depths=(3, 3, 27, 3), dims=(96, 192, 384, 768))
convnext_base = partial(ConvNeXt, depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024))
convnext_large = partial(ConvNeXt, depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536))
convnext_xlarge = partial(ConvNeXt, depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048))
