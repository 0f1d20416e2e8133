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
import numpy as np
from flax import linen as nn

from nkbx.models.common import ConvBN, global_avg_pool


def _avg_down_pool(x):
    """timm avg_down shortcut pool: AvgPool2d(2, 2, ceil_mode=True,
    count_include_pad=False) — for odd H/W the trailing row/col pools over
    its 1-wide valid window (flax count_include_pad=False with asymmetric
    padding reproduces ceil_mode exactly)."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    return nn.avg_pool(x, (2, 2), strides=(2, 2),
                       padding=((0, ph), (0, pw)), count_include_pad=False)


def space_to_depth(x, block: int = 2):
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C); channel order (row, col, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


def _s2d_tap_mask(c: int) -> np.ndarray:
    """(4, 4, 4c, 1) 0/1 mask of the LIVE taps of the s2d stem kernel.

    The 4x4-over-blocks kernel covers an 8x8 input window; the original 7x7
    window occupies offsets 1..7, so taps at absolute offset 0 (u==0,r==0 /
    v==0,s==0) do not exist in the 7x7 conv. Masking them in the FORWARD keeps
    training exactly equivalent to the 7x7 stem: their gradient is zeroed, so
    the effective kernel never grows the extra row/column."""
    m = np.zeros((4, 4, 2, 2, c), np.float32)
    for u in range(4):
        for v in range(4):
            for r in range(2):
                for s in range(2):
                    if 2 * u + r > 0 and 2 * v + s > 0:
                        m[u, v, r, s] = 1.0
    return m.reshape(4, 4, 4 * c)[..., None]


class _MaskedS2DConv(nn.Module):
    """4x4/s1 conv over the space-to-depth input with dead taps masked out
    (param tree path kept identical to nn.Conv: <name>/kernel).

    ``input_norm=(mean, std)`` (pixel units, i.e. [0,255]) folds the input
    Normalize into the conv: kernel is scaled by 1/std per input channel and
    the mean is subtracted via a bias MAP, so the layer computes EXACTLY
    conv((x - mean)/std) — including at the zero-padded borders, where fewer
    taps fall inside the image — while consuming the RAW uint8-valued batch.
    The augment stage's separate normalize pass (one full-image bf16
    write+read through HBM) disappears; autodiff through the fold gives the
    identical gradients to normalizing the input (the scale and bias are part
    of the graph). The bias map is built by convolving a TINY (12x12-block)
    constant mean image and tiling its interior value — O(1) work per step,
    exact because tap validity at any position matches one of the small
    conv's border/interior positions."""

    features: int
    dtype: Any = jnp.float32
    input_norm: Any = None  # ((3,) mean, (3,) std) in [0,255] units

    @nn.compact
    def __call__(self, x):
        import jax

        def conv(inp, k):
            return jax.lax.conv_general_dilated(
                inp, k, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, c, self.features), jnp.float32)
        mask = jnp.asarray(_s2d_tap_mask(c // 4))
        k32 = kernel * mask
        if self.input_norm is None:
            return conv(x.astype(self.dtype), k32.astype(self.dtype))
        mean, std = (np.asarray(v, np.float32) for v in self.input_norm)
        # s2d channel order is (row, col, c): tile the 3-channel stats
        inv = jnp.asarray(np.tile(1.0 / std, c // 3), jnp.float32)
        mu = jnp.asarray(np.tile(mean, c // 3), jnp.float32)
        k32 = k32 * inv[None, None, :, None]
        k = k32.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        s = 12  # small probe: border rows/cols 0..3 / -4..-1, interior at 5
        probe = conv(jnp.broadcast_to(mu, (1, s, s, c)).astype(self.dtype), k)

        def tile_axis(t, axis, n):
            lo = jax.lax.slice_in_dim(t, 0, 4, axis=axis)
            mid = jax.lax.slice_in_dim(t, 5, 6, axis=axis)
            hi = jax.lax.slice_in_dim(t, s - 4, s, axis=axis)
            reps = [1, 1, 1, 1]
            reps[axis] = n - 8
            return jnp.concatenate([lo, jnp.tile(mid, reps), hi], axis=axis)

        bias_map = tile_axis(tile_axis(probe, 1, h), 2, w)  # (1, h, w, feat)
        return conv(x.astype(self.dtype), k) - bias_map


class S2DStemConvBN(nn.Module):
    """Space-to-depth stem ConvBN (same tree paths as ConvBN: Conv_0 +
    BatchNorm_0, so converted checkpoints slot in unchanged)."""

    features: int
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    input_norm: Any = None
    ghost_bn: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        from nkbx.models.common import TorchBatchNorm

        x = _MaskedS2DConv(self.features, dtype=self.dtype,
                           input_norm=self.input_norm, name="Conv_0")(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                           dtype=self.dtype, ghost_bn=self.ghost_bn,
                           name="BatchNorm_0")(
            x, mask=mask if train else None)
        return nn.relu(x)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    ghost_bn: int = 0
    avg_down: bool = False  # timm 'd' variants: avg-pool + 1x1/s1 shortcut
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        residual = x
        g = self.ghost_bn
        y = ConvBN(self.features, 3, self.strides, dtype=self.dtype, ghost_bn=g)(x, train, mask)
        y = ConvBN(self.features, 3, 1, act=None, dtype=self.dtype, ghost_bn=g)(y, train, mask)
        if residual.shape != y.shape:
            ds, s = x, self.strides
            if self.avg_down:
                if self.strides > 1:
                    ds = _avg_down_pool(x)
                s = 1
            residual = ConvBN(self.features, 1, s, act=None, dtype=self.dtype, ghost_bn=g, name="downsample")(ds, train, mask)
        return nn.relu(y + residual)


class SEModule(nn.Module):
    """timm SEModule: global-pool -> fc1 1x1 conv -> relu -> fc2 -> sigmoid gate
    (timm/layers/squeeze_excite.py semantics; used by seresnet* variants)."""

    rd_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(self.dtype)
        s = nn.Conv(self.rd_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="fc2")(s)
        return x * nn.sigmoid(s)


class Bottleneck(nn.Module):
    """timm Bottleneck: width = floor(planes * base_width/64) * cardinality,
    3x3 conv grouped by cardinality, optional SE after bn3 before the residual
    add (timm resnet.py Bottleneck.forward order)."""

    features: int
    strides: int = 1
    cardinality: int = 1
    base_width: int = 64
    se_ratio: float = 0.0
    dtype: Any = jnp.float32
    ghost_bn: int = 0
    # Fused Pallas chain (nkbx/ops/bottleneck.py): the whole stride-1
    # identity-shortcut block — conv1x1+BN+relu -> conv3x3+BN+relu ->
    # conv1x1+BN -> +residual -> relu — as ONE VMEM-resident kernel per pass,
    # batch-tiled with per-tile (ghost) BN stats. Requires ghost_bn == the
    # kernel's batch tile; falls back to the XLA path for strided/projection
    # blocks and in eval mode.
    fused: bool = False
    avg_down: bool = False  # timm 'd' variants: avg-pool + 1x1/s1 shortcut
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        residual = x
        out = self.features * self.expansion
        width = int(self.features * (self.base_width / 64.0)) * self.cardinality
        g = self.ghost_bn
        if (self.fused and train and self.strides == 1 and x.shape[-1] == out
                and self.cardinality == 1 and self.se_ratio == 0.0
                and g and x.shape[0] % g == 0
                and not self.is_initializing()):
            from nkbx.ops.bottleneck import chain_tile, fused_bottleneck_chain

            if mask is not None:
                raise ValueError("fused bottleneck requires drop_last=True (no mask)")
            th = chain_tile(x.shape[0], x.shape[1], x.shape[2], out, width,
                            g, jnp.dtype(self.dtype).itemsize)
            if th is not None:
                return fused_bottleneck_chain(self, x, width, out, g, th)
            # geometry exceeds VMEM (e.g. ResNet-50 stage 4's 3x3x512x512
            # weights + f32 grad accumulators): fall back to the XLA
            # ghost-BN path below (batch-group stats, no row banding)
        y = ConvBN(width, 1, 1, dtype=self.dtype, ghost_bn=g)(x, train, mask)
        y = ConvBN(width, 3, self.strides, groups=self.cardinality, dtype=self.dtype, ghost_bn=g)(y, train, mask)
        y = ConvBN(out, 1, 1, act=None, dtype=self.dtype, ghost_bn=g)(y, train, mask)
        if self.se_ratio > 0:
            y = SEModule(int(out * self.se_ratio), dtype=self.dtype, name="se")(y)
        if residual.shape != y.shape:
            ds, s = x, self.strides
            if self.avg_down:
                if self.strides > 1:
                    ds = _avg_down_pool(x)
                s = 1
            residual = ConvBN(out, 1, s, act=None, dtype=self.dtype, ghost_bn=g, name="downsample")(ds, train, mask)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block_cls: Type[nn.Module]
    stem: str = "default"  # "default" 7x7/s2 | "tiered" 3x 3x3 (timm *t) |
    #                        "deep" 3x 3x3 w/ (w, w, 2w) channels (timm *d)
    stem_width: int = 64
    cardinality: int = 1  # ResNeXt groups (Bottleneck only)
    base_width: int = 64  # per-group width factor (wide_resnet*_2 -> 128)
    se_ratio: float = 0.0  # seresnet*: SE reduction on out channels (1/16)
    drop_rate: float = 0.0
    dtype: Any = jnp.float32
    # EXACT space-to-depth reparametrization of the default 7x7/s2 stem conv
    # (the MLPerf ResNet TPU trick): input -> (H/2, W/2, 12), kernel zero-padded
    # to 8x8 and regrouped to 4x4x12, stride 1 — same linear map, measured 35%
    # faster fwd+dW on the dev chip (PERF.md). Requires even H and W. Converted
    # torch conv1 weights are regrouped by nkbx.models.convert.s2d_conv1_weight.
    s2d_stem: bool = True
    # Fold Normalize((mean, std), pixel units) into the stem conv (s2d stem
    # only): the model then consumes the RAW [0,255] batch and computes
    # exactly conv((x - mean)/std) — see _MaskedS2DConv.input_norm.
    input_norm: Any = None
    # Stage indices whose blocks run under jax.checkpoint (nn.remat): trades
    # recompute FLOPs for saved-activation HBM traffic (r3 remat sweep).
    remat_stages: Sequence[int] = ()
    # --- max-throughput recipe opt-ins (SEMANTICS-CHANGING, PERF.md) ---
    # ghost_bn=g: BN batch stats per ghost batch of g rows instead of the
    # full batch (TorchBatchNorm.ghost_bn). NOT the reference's algorithm.
    ghost_bn: int = 0
    # fused_bottleneck: run stride-1 identity Bottleneck blocks as ONE Pallas
    # VMEM-resident chain kernel per pass (nkbx/ops/bottleneck.py). Requires
    # ghost_bn (per-batch-tile stats are the tiling contract).
    fused_bottleneck: bool = False
    # timm 'd' variants (resnet18d/34d/50d): every downsample shortcut is
    # avg_pool(2,2) + 1x1/s1 conv instead of a strided 1x1 conv
    avg_down: bool = False

    @property
    def num_features(self):
        return 64 * (2 ** (len(self.stage_sizes) - 1)) * self.block_cls.expansion

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        g = self.ghost_bn
        if self.stem in ("tiered", "deep"):
            # three 3x3 convs: timm tiered = (3*w//4, w, 2w) channels,
            # timm deep ('d' variants) = (w, w, 2w); same key layout
            w = self.stem_width
            c0 = 3 * w // 4 if self.stem == "tiered" else w
            x = ConvBN(c0, 3, 2, dtype=self.dtype, ghost_bn=g)(x, train, mask)
            x = ConvBN(w, 3, 1, dtype=self.dtype, ghost_bn=g)(x, train, mask)
            x = ConvBN(2 * w, 3, 1, dtype=self.dtype, ghost_bn=g)(x, train, mask)
        elif self.s2d_stem:
            if x.shape[1] % 2 or x.shape[2] % 2:
                raise ValueError(
                    f"s2d_stem requires even input H/W, got {x.shape[1:3]}; "
                    "construct ResNet(s2d_stem=False) for odd sizes"
                )
            x = space_to_depth(x, 2)
            # pad (2,1): 8x8 zero-padded kernel at offset (1,1) over 2x2 blocks
            # reproduces conv7x7/s2 pad 3 exactly (see s2d_conv1_weight); dead
            # taps masked so training stays 7x7-equivalent
            x = S2DStemConvBN(self.stem_width, dtype=self.dtype,
                              input_norm=self.input_norm, ghost_bn=g,
                              name="ConvBN_0")(x, train, mask)
        else:
            if self.input_norm is not None:
                raise ValueError("input_norm folding requires the s2d stem")
            x = ConvBN(self.stem_width, 7, 2, dtype=self.dtype, ghost_bn=g)(x, train, mask)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.fused_bottleneck and not self.ghost_bn:
            raise ValueError("fused_bottleneck requires ghost_bn (per-tile "
                             "BN stats are the kernel's tiling contract)")
        if self.fused_bottleneck and self.block_cls is not Bottleneck:
            raise ValueError(
                "fused_bottleneck covers Bottleneck blocks only (resnet26/"
                "50/101/...); BasicBlock ResNets have no fused chain — "
                "silently ignoring the flag would fake the benchmark")
        block_kwargs = {"ghost_bn": self.ghost_bn, "avg_down": self.avg_down}
        if self.block_cls is Bottleneck:
            block_kwargs = dict(cardinality=self.cardinality,
                                base_width=self.base_width, se_ratio=self.se_ratio,
                                ghost_bn=self.ghost_bn,
                                fused=self.fused_bottleneck,
                                avg_down=self.avg_down)
        # blocks are explicitly named with the UN-wrapped class's auto-name
        # pattern, so param paths (and checkpoints) are identical across
        # remat_stages settings; train (arg 2) is static under remat
        remat_cls = (nn.remat(self.block_cls, static_argnums=(2,))
                     if self.remat_stages else None)
        block_i = 0
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = 64 * (2**stage)
            cls = remat_cls if stage in self.remat_stages else self.block_cls
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = cls(features, strides, dtype=self.dtype,
                        name=f"{self.block_cls.__name__}_{block_i}",
                        **block_kwargs)(x, train, mask)
                block_i += 1
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
resnet152 = partial(ResNet, stage_sizes=(3, 8, 36, 3), block_cls=Bottleneck)
resnext50_32x4d = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, cardinality=32, base_width=4)
resnext101_32x8d = partial(ResNet, stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck, cardinality=32, base_width=8)
wide_resnet50_2 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, base_width=128)
seresnet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, se_ratio=1 / 16)
seresnext50_32x4d = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, cardinality=32, base_width=4, se_ratio=1 / 16)
# timm 'd' variants: deep (w, w, 2w) 3x3 stem + avg-pool downsample shortcuts
resnet18d = partial(ResNet, stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, stem="deep", stem_width=32, avg_down=True)
resnet34d = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock, stem="deep", stem_width=32, avg_down=True)
resnet50d = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, stem="deep", stem_width=32, avg_down=True)
