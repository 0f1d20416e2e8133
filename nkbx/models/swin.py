"""Swin Transformer V1 (tiny/small/base) — shifted-window attention. Flax, NHWC.

TPU-native implementation of the architecture the reference reaches via
``timm.create_model("swin_tiny_patch4_window7_224", num_classes=0)``
(reference model.py:82-83). Follows the original microsoft/Swin-Transformer
semantics exactly (timm's V1 module mirrors it): patch-embed 4x4 conv + LN;
stages of [window-attn, shifted-window-attn] blocks with relative position
bias; PatchMerging (2x2 concat in (x0=even/even, x1=odd/even, x2=even/odd,
x3=odd/odd) order -> LN -> Linear 4C->2C, no bias) between stages; final LN +
token-mean pool.

The token grid is kept as (B, H, W, C) between blocks — window partitioning
is a static reshape/transpose XLA folds into the attention layout, and all
shapes (window counts, shift masks) are Python-static so the whole network
traces into one fused program.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _relative_position_index(w: int) -> np.ndarray:
    """(N, N) lookup into the (2w-1)^2 relative-position-bias table
    (microsoft Swin WindowAttention.__init__ math)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0).copy()
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask (-100 across region boundaries) for shifted
    windows (microsoft Swin SwinTransformerBlock.__init__ img_mask math)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(h // window, window, w // window, window)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = wins[:, None, :] != wins[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _window_partition(x, window: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def _window_reverse(windows, window: int, b: int, h: int, w: int):
    c = windows.shape[-1]
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _use_fused(flag, groups=None):
    """None = auto: fused Pallas attention on TPU (+44% swin_tiny, PERF.md),
    plain XLA elsewhere. The window-group count G = batch·windows is passed
    so NKBX_FUSED_MIN_G can route small-G stages to XLA per call site — the
    round-3 G sweep measured all-fused optimal at every Swin G, so the
    default gate is open. NKBX_FUSED_ATTENTION=0|1 overrides; export tracing
    force-disables (see nkbx.ops.attention.resolve_fused)."""
    import jax

    from nkbx.ops.attention import resolve_fused

    return resolve_fused(flag, jax.default_backend() == "tpu", groups)


class WindowAttention(nn.Module):
    dim: int
    n_heads: int
    window: int
    dtype: Any = jnp.float32
    fused: Any = None  # None=auto (TPU) | True | False — see nkbx/ops/attention.py

    @nn.compact
    def __call__(self, x, attn_mask=None):
        # x: (B*nW, N, C); attn_mask: (nW, N, N) or None
        bn, n, c = x.shape
        hd = self.dim // self.n_heads
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.n_heads), jnp.float32)
        # index stays STATIC numpy: export traces apply() with device_get'd
        # (numpy) variables, and numpy table[jnp_index] would try to convert
        # a tracer; jnp.asarray(table) handles both numpy and tracer params.
        index = _relative_position_index(self.window).reshape(-1)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        bias = jnp.asarray(table)[index].reshape(n, n, self.n_heads)
        if _use_fused(self.fused, groups=bn):
            # qkv factors as (3, heads, hd) in the minor dim — exactly the
            # packed layout fused_attention_qkv consumes (no slice copies).
            from nkbx.ops.attention import fused_attention_qkv

            mask = (np.zeros((1, n, n), np.float32) if attn_mask is None
                    else np.asarray(attn_mask, np.float32))
            y = fused_attention_qkv(
                qkv, bias.transpose(2, 0, 1).astype(jnp.float32),
                jnp.asarray(mask), hd ** -0.5, self.n_heads)
        else:
            qkv = qkv.reshape(bn, n, 3, self.n_heads, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * (hd ** -0.5)) @ k.transpose(0, 1, 3, 2)  # (bn, heads, N, N)
            attn = attn + bias.transpose(2, 0, 1).astype(attn.dtype)[None]
            if attn_mask is not None:
                nw = attn_mask.shape[0]
                attn = attn.reshape(bn // nw, nw, self.n_heads, n, n)
                attn = attn + jnp.asarray(attn_mask, attn.dtype)[None, :, None]
                attn = attn.reshape(bn, self.n_heads, n, n)
            attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            y = (attn @ v).transpose(0, 2, 1, 3).reshape(bn, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(y)


class SwinBlock(nn.Module):
    dim: int
    n_heads: int
    window: int
    shift: int  # 0 or window // 2
    mlp_ratio: int = 4
    dtype: Any = jnp.float32
    fused: Any = None
    fused_mlp: Any = None  # None=auto (TPU) | True | False — see nkbx/ops/mlp.py

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # original Swin: a window that does not fit the grid collapses to the
        # grid (then no shift) — SwinTransformerBlock.__init__
        window = min(self.window, h, w)
        shift = self.shift if window < min(h, w) else 0
        if h % window or w % window:
            raise ValueError(f"token grid {h}x{w} not divisible by window {window}")

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask(h, w, window, shift)
        else:
            mask = None
        wins = _window_partition(x, window)
        wins = WindowAttention(self.dim, self.n_heads, window,
                               dtype=self.dtype, fused=self.fused,
                               name="attn")(wins, mask)
        x = _window_reverse(wins, window, b, h, w)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x

        # MLP half (norm2 + fc1/gelu/fc2 + residual): params declared
        # flax-identically either way (checkpoint/converter-compatible); on
        # TPU the whole half lowers to ONE fused VMEM kernel per pass
        # (nkbx/ops/mlp.py — LN stats, GELU intermediates, and the residual
        # never make separate HBM round trips).
        from nkbx.models.common import mlp_tail

        return mlp_tail(x, x, self.dim * self.mlp_ratio, ln_name="norm2",
                        fc_names=("fc1", "fc2"), eps=1e-5, dtype=self.dtype,
                        flag=self.fused_mlp)


class PatchMerging(nn.Module):
    dim: int  # input channel count C; output is 2C
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # concat order (even/even, odd/even, even/odd, odd/odd) matches
        # microsoft Swin PatchMerging.forward — converted weights depend on it
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="reduction")(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    n_heads: Sequence[int] = (3, 6, 12, 24)
    patch_size: int = 4
    window: int = 7
    mlp_ratio: int = 4
    drop_rate: float = 0.0
    dtype: Any = jnp.float32
    fused_attention: Any = None  # None=auto (TPU): fused Pallas window attention
    fused_mlp: Any = None  # None=auto (TPU, where VMEM-viable) — nkbx/ops/mlp.py

    @property
    def num_features(self):
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)
        dim = self.embed_dim
        for i, (depth, heads) in enumerate(zip(self.depths, self.n_heads)):
            for j in range(depth):
                x = SwinBlock(dim, heads, self.window,
                              shift=(self.window // 2) if j % 2 else 0,
                              mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                              fused=self.fused_attention,
                              fused_mlp=self.fused_mlp,
                              name=f"stage{i}_block{j}")(x)
            if i != len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"downsample{i}")(x)
                dim *= 2
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        return x.astype(jnp.float32)


swin_tiny_patch4_window7_224 = partial(
    SwinTransformer, embed_dim=96, depths=(2, 2, 6, 2), n_heads=(3, 6, 12, 24))
swin_small_patch4_window7_224 = partial(
    SwinTransformer, embed_dim=96, depths=(2, 2, 18, 2), n_heads=(3, 6, 12, 24))
swin_base_patch4_window7_224 = partial(
    SwinTransformer, embed_dim=128, depths=(2, 2, 18, 2), n_heads=(4, 8, 16, 32))
swin_large_patch4_window7_224 = partial(
    SwinTransformer, embed_dim=192, depths=(2, 2, 18, 2), n_heads=(6, 12, 24, 48))
# the 384 fine-tune variants are genuinely different architectures (window 12
# — a (23^2, heads) relative-position-bias table); the token grid must divide
# by 12, i.e. inputs of 48k px (384, 192, ...)
swin_base_patch4_window12_384 = partial(
    SwinTransformer, embed_dim=128, depths=(2, 2, 18, 2), n_heads=(4, 8, 16, 32),
    window=12)
swin_large_patch4_window12_384 = partial(
    SwinTransformer, embed_dim=192, depths=(2, 2, 18, 2), n_heads=(6, 12, 24, 48),
    window=12)
