"""Shared building blocks for nkbx backbones (Flax linen, NHWC, bf16-ready).

All backbones follow one contract:

- ``__call__(x, train: bool) -> (B, num_features)`` pooled embedding;
- class attr/property ``num_features``;
- ``drop_rate`` overrides internal dropout (the TPU-native analog of the
  reference's recursive ``set_dropout``, model.py:66-72);
- ``dtype`` is the compute dtype (bf16 on TPU), params stay float32
  (``param_dtype``) — the reference's AMP-autocast analog without a GradScaler,
  since bf16 has fp32 exponent range (engine.py:43-47 replacement).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def torch_kaiming_normal():
    # torch.nn.init.kaiming_normal_(nonlinearity='relu'): N(0, 2/fan_in), untruncated
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def torch_kaiming_uniform():
    return nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def torch_xavier_normal():
    return nn.initializers.variance_scaling(1.0, "fan_avg", "normal")


def torch_xavier_uniform():
    return nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


INIT_STRATEGIES: dict[str, Callable] = {
    # same strategy names as reference model.py:45-57
    "kaiming_normal_": torch_kaiming_normal,
    "kaiming_uniform_": torch_kaiming_uniform,
    "xavier_normal_": torch_xavier_normal,
    "xavier_uniform_": torch_xavier_uniform,
}


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact running-stats semantics.

    flax ``nn.BatchNorm`` folds the BIASED batch variance into the running
    variance; torch stores the UNBIASED one (``var * n/(n-1)``,
    torch.nn.BatchNorm docs) while normalizing with the biased one. Fine-tunes
    from converted torch weights would otherwise drift in eval mode (the
    running stats feed inference). Normalization math and the param/stat tree
    names (scale/bias, batch_stats mean/var) are identical to flax's, so
    converters and checkpoints are unaffected.

    ``mask`` (broadcastable to x) weights padded batch rows out of the
    statistics; ``n`` is then the number of unmasked elements.

    ``ghost_bn=g`` (opt-in, SEMANTICS-CHANGING — not the reference's exact
    algorithm) computes batch statistics per ghost batch of ``g`` rows
    instead of over the full batch ("ghost batch norm", Hoffer et al. 2017):
    each group of ``g`` consecutive batch rows is normalized by its OWN
    mean/var over (g, spatial) elements; running stats accumulate the MEAN of
    the per-group stats (mean of unbiased group vars, n = g*H*W). This is the
    tiling contract the fused Pallas bottleneck-chain kernel needs (stats
    local to a batch tile — nkbx/ops/bottleneck.py); eval mode is unchanged
    (running stats). Requires ``g`` to divide the batch and no mask
    (drop_last=True).
    """

    use_running_average: bool = False
    momentum: float = 0.9  # torch momentum 0.1 == flax/nkbx momentum 0.9
    epsilon: float = 1e-5
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32
    ghost_bn: int = 0  # 0 = exact full-batch stats (reference semantics)

    @nn.compact
    def __call__(self, x, mask=None):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, self.param_dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, self.param_dtype))
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif self.ghost_bn and not self.is_initializing():
            if mask is not None:
                raise ValueError(
                    "ghost_bn is incompatible with masked (padded) batches — "
                    "use drop_last=True with the max-throughput recipe")
            b = x.shape[0]
            g = self.ghost_bn
            if b % g:
                raise ValueError(f"ghost_bn={g} must divide the batch ({b})")
            xg = x.astype(jnp.float32).reshape((b // g, g) + x.shape[1:])
            axes = tuple(range(1, xg.ndim - 1))  # (g, spatial) per group
            gmean = jnp.mean(xg, axes)                      # (B/g, C)
            gmean2 = jnp.mean(xg * xg, axes)
            gvar = jnp.maximum(gmean2 - gmean * gmean, 0.0)
            n = float(g * np.prod(x.shape[1:-1]))
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * jnp.mean(gmean, 0)
            ra_var.value = m * ra_var.value + (1.0 - m) * jnp.mean(
                gvar * (n / max(n - 1.0, 1.0)), 0)
            inv = jax.lax.rsqrt(gvar + self.epsilon) * scale   # (B/g, C)
            bshape = (b // g,) + (1,) * (xg.ndim - 2) + (c,)
            yg = (xg - gmean.reshape(bshape)) * inv.reshape(bshape) + bias
            dtype = self.dtype or x.dtype
            return yg.reshape(x.shape).astype(dtype)
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            where = None if mask is None else jnp.broadcast_to(
                jnp.asarray(mask, bool), x.shape)
            mean = jnp.mean(xf, axes, where=where)
            mean2 = jnp.mean(xf * xf, axes, where=where)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                if where is None:
                    n = jnp.asarray(float(np.prod([x.shape[a] for a in axes])))
                else:
                    n = jnp.sum(where, dtype=jnp.float32) / c
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased

        dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(dtype)


class ConvBN(nn.Module):
    """Conv + BatchNorm + optional activation, NHWC.

    ``mask`` (optional, shape ``(B, 1, 1, 1)`` bool) weights padded batch rows
    out of the BatchNorm batch statistics: with ``drop_last=False`` the loader
    pads the final batch with zero rows, and unmasked stats would be
    contaminated by them (the reference avoids the issue only because its
    shipped configs set ``drop_last=True``).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.float32
    bn_momentum: float = 0.9
    padding: Any = None  # None -> torch-style symmetric k//2
    ghost_bn: int = 0  # ghost-batch stats group size (see TorchBatchNorm)

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        # torch/timm pad symmetrically by k//2; flax 'SAME' is ASYMMETRIC for
        # stride-2 convs on even inputs (e.g. (2,3) instead of (3,3) for the
        # 7x7/s2 stem at 224px), which shifts every tap window and breaks
        # converted pretrained weights
        k = self.kernel_size
        padding = self.padding if self.padding is not None else ((k // 2, k // 2), (k // 2, k // 2))
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=padding,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            dtype=self.dtype,
            ghost_bn=self.ghost_bn,
            name="BatchNorm_0",  # keep the flax-BatchNorm tree path (converters)
        )(x, mask=mask if train else None)
        if self.act is not None:
            x = self.act(x)
        return x


def make_divisible(v, divisor=8):
    """Channel rounding shared by the mobile families (timm convention)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


class SqueezeExcite(nn.Module):
    """``act`` is the reduce-conv activation: ReLU for MobileNetV3, the block
    act (swish) for EfficientNet — both per the torch/timm originals."""

    reduced: int
    gate: Callable = hard_sigmoid
    act: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # pool in fp32 (same numerics as resnet.SEModule, the seresnet twin
        # that keeps timm's fc1/fc2 tree names)
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(s)
        s = self.act(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(s)
        return x * self.gate(s)


class LayerNormParams(nn.Module):
    """Declare ``nn.LayerNorm``-identical scale/bias params without running
    it — the LN-fused MLP kernel (nkbx/ops/mlp.py) consumes them directly
    while keeping the exact ``<name>/scale`` + ``<name>/bias`` tree paths,
    shapes, and inits, so checkpoints and converters are flag-agnostic."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (features,), jnp.float32)
        return scale, bias


def mlp_tail(x, shortcut, hidden, *, ln_name, fc_names, eps, dtype, flag,
             auto=None, gamma=None, drop_rate=0.0, train=False):
    """Transformer-block MLP half with ONE fused/XLA dispatch point, shared
    by ConvNeXt/Swin/ViT blocks: ``shortcut + [gamma *] MLP(LN(x))``.

    Declares params flax-identically across lowerings — the LN under
    ``ln_name`` (scale/bias) and the two Denses under ``fc_names``
    (kernel/bias) — so checkpoints and converters are flag-agnostic, then
    routes per :func:`nkbx.ops.mlp.fused_mlp_mode`: the whole half as one
    Pallas VMEM kernel per pass (``"ln"``), the MLP-only kernel after an XLA
    LayerNorm (``"mlp"``), or the plain XLA program (``None``). ``gamma`` is
    an optional layer-scale param (ConvNeXt); ``drop_rate``/``train`` add the
    torch-parity mid-MLP Dropout (ViT) — when it is active the fused paths
    are disabled (the kernel has no RNG). Must be called from a compact
    module method (params attach to the caller's scope).
    """
    from nkbx.ops.mlp import fused_ln_mlp, fused_mlp, fused_mlp_mode

    dim = x.shape[-1]
    w0, b0 = DenseParams(hidden, name=fc_names[0])(dim)
    w1, b1 = DenseParams(dim, name=fc_names[1])(hidden)
    # under jax.export symbolic shapes the leading dims aren't ints — the
    # fused kernels are static-shape only, so rows=None routes to XLA
    # (export paths force-disable fusion anyway, but the gate must not do
    # arithmetic on symbolic dims).
    lead = x.shape[:-1]
    rows = (int(np.prod(lead))
            if all(isinstance(d, (int, np.integer)) for d in lead) else None)
    drop_active = drop_rate > 0 and train
    mode = (None if drop_active else
            fused_mlp_mode(flag, rows, dim, hidden,
                           jnp.dtype(dtype).itemsize, auto=auto))
    if mode == "ln":
        ns, nb = LayerNormParams(name=ln_name)(dim)
        return fused_ln_mlp(x, ns, nb, w0.astype(dtype), b0,
                            w1.astype(dtype), b1, shortcut=shortcut,
                            gamma=gamma, eps=eps)
    y = nn.LayerNorm(epsilon=eps, dtype=dtype, param_dtype=jnp.float32,
                     name=ln_name)(x)
    if mode == "mlp":
        y = fused_mlp(y, w0.astype(dtype), b0, w1.astype(dtype), b1)
    else:
        y = y @ w0.astype(dtype) + b0.astype(dtype)
        y = nn.gelu(y, approximate=False)  # timm uses exact GELU
        if drop_rate > 0:
            y = nn.Dropout(drop_rate)(y, deterministic=not train)
        y = y @ w1.astype(dtype) + b1.astype(dtype)
    if gamma is not None:
        y = y * gamma.astype(y.dtype)
    return shortcut + y


class _ConvKernelParam(nn.Module):
    """Declare an ``nn.Conv``-identical kernel param without running it
    (``<name>/kernel``, HWIO, lecun_normal — the flax Conv defaults)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _BNParamsStats(nn.Module):
    """Declare TorchBatchNorm-identical scale/bias params and mean/var
    running-stat variables without running it (same tree paths)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        return scale, bias, ra_mean, ra_var


class ConvBNParams(nn.Module):
    """Declare a ConvBN-identical param/stat subtree without running it —
    the fused bottleneck-chain kernel (nkbx/ops/bottleneck.py) consumes the
    leaves directly while keeping the exact ``<name>/Conv_0/kernel`` +
    ``<name>/BatchNorm_0/{scale,bias}`` (+ batch_stats mean/var) tree paths,
    so checkpoints and converters are flag-agnostic."""

    features: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, in_features: int):
        k = self.kernel_size
        kernel = _ConvKernelParam(
            (k, k, in_features, self.features), name="Conv_0")()
        scale, bias, ra_mean, ra_var = _BNParamsStats(
            name="BatchNorm_0")(self.features)
        return kernel, scale, bias, ra_mean, ra_var


class DenseParams(nn.Module):
    """Declare an ``nn.Dense``-identical param pair without running it.

    Used by fused-MLP call sites (nkbx/ops/mlp.py): the fused kernel
    subsumes two Dense layers, but their params must keep the exact
    ``<name>/kernel`` + ``<name>/bias`` tree paths, shapes, and default
    inits so checkpoints and converters are flag-agnostic. The plain-XLA
    fallback applies them as ``x @ kernel + bias`` in the compute dtype —
    exactly what ``nn.Dense`` computes.
    """

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias
