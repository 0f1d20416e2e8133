"""Vision Transformer (ViT-S/B, patch 16/32) + unicom-style metric-learning ViT.

Covers the reference's ``unicom ViT-B/32`` path (reference model.py:77-79: unicom
models emit a projected embedding whose size comes from ``feature[-2].out_features``
— i.e. a trunk + MLP feature head ending in a 512-d embedding).

Attention is plain full attention (images at <=512 px give <=257 tokens; sequence
parallelism is an explicit non-goal, SURVEY.md §5.7). Heads could shard over the
mesh's ``model`` axis via nkbx.parallel if ever needed.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from nkbx.models.common import TorchBatchNorm


def _fused_attention_fn(query, key, value, bias=None, mask=None, **kw):
    """`flax.linen.MultiHeadDotProductAttention` attention_fn hook routing to
    the fused Pallas kernel (nkbx/ops/attention.py). Only installed when
    there is no attention mask/bias/dropout — always true for these ViTs."""
    from nkbx.ops.attention import fused_attention

    assert bias is None and mask is None
    b, n, h, d = query.shape
    o = fused_attention(
        query.reshape(b, n, h * d), key.reshape(b, n, h * d),
        value.reshape(b, n, h * d),
        jnp.zeros((1, n, n), jnp.float32), jnp.zeros((1, n, n), jnp.float32),
        d ** -0.5, h)
    return o.reshape(b, n, h, d)


def _use_fused(flag):
    """None = auto: plain XLA. MEASURED NEGATIVE for ViT (PERF.md round 3):
    vit_base @224 bs=64 trains at 1,053 img/s XLA vs 980 fused — N=197
    tokens already fills the MXU in XLA's batched attention, unlike Swin's
    49-token windows (where the same kernel is +38%, see swin.py). Kept as
    an explicit opt-in (fused_attention=True) for small-window ViT variants.
    NKBX_FUSED_ATTENTION=0|1 overrides; export tracing force-disables
    (see nkbx.ops.attention.resolve_fused)."""
    from nkbx.ops.attention import resolve_fused

    return resolve_fused(flag, False)


class TransformerBlock(nn.Module):
    dim: int
    n_heads: int
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    dtype: Any = jnp.float32
    ln_eps: float = 1e-6  # timm passes eps=1e-6; unicom keeps torch default 1e-5
    fused: Any = None  # None=XLA (fused measured -7% for ViT; see _use_fused)
    fused_mlp: Any = None  # None=XLA (fused measured non-win for ViT); True opts in

    @nn.compact
    def __call__(self, x, train: bool = False):
        fused = _use_fused(self.fused) and not (self.drop_rate > 0 and train)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            dropout_rate=self.drop_rate,
            deterministic=not train,
            **({"attention_fn": _fused_attention_fn} if fused else {}),
        )(y, y)
        x = x + y
        # MLP half: params declared flax-identically either way (auto-named
        # LayerNorm_1 + Dense_0/Dense_1 paths, checkpoint/converter-
        # compatible). Default is the XLA program (auto=False): the fused
        # VMEM kernel is a MEASURED non-win for ViT (PERF.md round 3 —
        # vit_small/16 flat, vit_tiny/16 −10%, vit_small/32 flat; vit_base
        # C=768 is MXU-bound and VMEM-gated out anyway), unlike Swin/ConvNeXt
        # whose early stages are intermediate-traffic-bound. Opt in with
        # fused_mlp=True; the fused path additionally requires the mid-MLP
        # Dropout inactive (drop_rate/train routes to XLA).
        from nkbx.models.common import mlp_tail

        return mlp_tail(x, x, int(self.dim * self.mlp_ratio),
                        ln_name="LayerNorm_1",
                        fc_names=("Dense_0", "Dense_1"), eps=self.ln_eps,
                        dtype=self.dtype, flag=self.fused_mlp, auto=False,
                        drop_rate=self.drop_rate, train=train)


class ViT(nn.Module):
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    n_heads: int = 12
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    pool: str = "cls"  # 'cls' | 'mean'
    projection_dim: Optional[int] = None  # unicom-style feature head -> 512
    dtype: Any = jnp.float32
    fused_attention: Any = None  # None=XLA; True opts into the Pallas kernel
    fused_mlp: Any = None  # None=XLA (fused measured non-win for ViT); True opts in

    @property
    def num_features(self):
        return self.projection_dim if self.projection_dim else self.dim

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):  # mask unused: no batch statistics
        b, h, w, _ = x.shape
        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.dim)
        if self.pool == "cls":
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
            x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, x.shape[1], self.dim)
        )
        x = x + pos.astype(x.dtype)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        for _ in range(self.depth):
            x = TransformerBlock(self.dim, self.n_heads, self.mlp_ratio, self.drop_rate,
                                 self.dtype, fused=self.fused_attention,
                                 fused_mlp=self.fused_mlp)(x, train)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = x[:, 0] if self.pool == "cls" else jnp.mean(x, axis=1)
        if self.projection_dim:
            # unicom feature head: LN -> Dense(proj) (emb_size = feature[-2].out_features)
            x = nn.Dense(self.projection_dim, dtype=self.dtype, param_dtype=jnp.float32, name="feature_proj")(x)
        return x.astype(jnp.float32)


class UnicomViT(nn.Module):
    """deepglint/unicom VisionTransformer (the reference's ``unicom.load`` path,
    model.py:77-79).

    Architecture per deepglint/unicom ``vision_transformer.py`` (insightface-
    style recognition ViT — the reference reads the embedding size from
    ``emb_model.feature[-2].out_features``, so ``feature`` is a Sequential whose
    [-2] entry is a Linear):

    - patch conv -> tokens + pos_embed, NO class token;
    - pre-LN transformer blocks (same block as timm ViT);
    - final LayerNorm, then ALL patch tokens flattened to ``(B, N*dim)``;
    - feature head ``Linear(N*dim -> dim, no bias) -> BatchNorm1d ->
      Linear(dim -> embedding_size, no bias) -> BatchNorm1d`` with eps=2e-5
      (torch BatchNorm1d default momentum 0.1 == flax momentum 0.9).

    The BatchNorm1d pair means unicom backbones carry batch_stats; the sample
    ``mask`` weights padded rows out of them like every other BN (see ConvBN).
    """

    patch_size: int = 32
    dim: int = 768
    depth: int = 12
    n_heads: int = 12
    embedding_size: int = 512
    input_size: int = 224
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    dtype: Any = jnp.float32
    fused_attention: Any = None
    fused_mlp: Any = None  # None=XLA (fused measured non-win for ViT); True opts in

    @property
    def num_features(self):
        return self.embedding_size  # reference emb_size = feature[-2].out_features

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        b = x.shape[0]
        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(x)
        n = x.shape[1] * x.shape[2]
        x = x.reshape(b, n, self.dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n, self.dim))
        x = x + pos.astype(x.dtype)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        for _ in range(self.depth):
            x = TransformerBlock(self.dim, self.n_heads, self.mlp_ratio,
                                 self.drop_rate, self.dtype, ln_eps=1e-5,
                                 fused=self.fused_attention,
                                 fused_mlp=self.fused_mlp)(x, train)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        x = x.reshape(b, n * self.dim)  # token-major flatten, as torch reshape
        bn_mask = mask.reshape(b, 1) if mask is not None else None
        x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="feature_fc1")(x)
        x = TorchBatchNorm(use_running_average=not train, epsilon=2e-5, momentum=0.9,
                           dtype=jnp.float32,
                           name="feature_bn1")(x, mask=bn_mask if train else None)
        x = nn.Dense(self.embedding_size, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="feature_fc2")(x)
        x = TorchBatchNorm(use_running_average=not train, epsilon=2e-5, momentum=0.9,
                           dtype=jnp.float32,
                           name="feature_bn2")(x, mask=bn_mask if train else None)
        return x


vit_tiny_patch16_224 = partial(ViT, patch_size=16, dim=192, depth=12, n_heads=3)
vit_small_patch16_224 = partial(ViT, patch_size=16, dim=384, depth=12, n_heads=6)
vit_small_patch32_224 = partial(ViT, patch_size=32, dim=384, depth=12, n_heads=6)
vit_base_patch16_224 = partial(ViT, patch_size=16, dim=768, depth=12, n_heads=12)
vit_base_patch32_224 = partial(ViT, patch_size=32, dim=768, depth=12, n_heads=12)
vit_large_patch16_224 = partial(ViT, patch_size=16, dim=1024, depth=24, n_heads=16)

# timm's deit_{tiny,small,base}_patch16_224 (non-distilled) are plain
# VisionTransformers — identical architecture and state-dict layout to the
# vit_* geometries above, differing only in pretrained weights
deit_tiny_patch16_224 = vit_tiny_patch16_224
deit_small_patch16_224 = vit_small_patch16_224
deit_base_patch16_224 = vit_base_patch16_224

# timm's fixed-384 fine-tune variants: the architecture is input-size-
# agnostic (pos_embed is built from the actual token grid; converted
# checkpoints resample bicubically on load — nkbx/models/convert.py
# resample_pos_embed), so the ctors alias the same geometries. The names
# exist so their 576-token pretrained checkpoints convert under their own
# timm identity.
vit_tiny_patch16_384 = vit_tiny_patch16_224
vit_small_patch16_384 = vit_small_patch16_224
vit_small_patch32_384 = vit_small_patch32_224
vit_base_patch16_384 = vit_base_patch16_224
vit_base_patch32_384 = vit_base_patch32_224
vit_large_patch16_384 = vit_large_patch16_224
vit_large_patch32_384 = partial(ViT, patch_size=32, dim=1024, depth=24, n_heads=16)

# unicom naming: "unicom ViT-B/32" etc. (reference model.py:77-79)
unicom_vit_b32 = partial(UnicomViT, patch_size=32, dim=768, depth=12, n_heads=12, embedding_size=512)
unicom_vit_b16 = partial(UnicomViT, patch_size=16, dim=768, depth=12, n_heads=12, embedding_size=768)
unicom_vit_l14 = partial(UnicomViT, patch_size=14, dim=1024, depth=24, n_heads=16, embedding_size=768)
