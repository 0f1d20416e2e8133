"""Mixup / CutMix — on-device batched label-mixing augmentation.

The reference has no mixup (torch users reach for timm.data.Mixup); nkbx
implements the same batch-mode recipe TPU-natively inside the jitted train
step: ONE Beta-sampled lam per step, each row mixed with the batch-reversed
row, CutMix as a centered random box with lam corrected to the true box area
(timm/data/mixup.py semantics, batch mode). The loss becomes
``lam * loss(labels) + (1-lam) * loss(labels[partner])`` — works unchanged
for CE/focal/multi-task criteria.

Padded (masked-out) rows are handled by PARTNER SELECTION, not a config
restriction: row i pairs with row B-1-i unless that row is padded, in which
case it pairs with ITSELF — self-mixing is the identity for the image and
makes the (1-lam) loss term collapse onto the row's own label, so the row
trains exactly as if unmixed. Works with ``drop_last=False`` loaders and
multi-host sentinel padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rand_box(key, h: int, w: int, lam):
    """Centered random box covering (1-lam) of the image; returns a
    (h, w) bool mask and the area-corrected lam (timm rand_bbox)."""
    cut = jnp.sqrt(1.0 - lam)
    ch = (cut * h).astype(jnp.int32)
    cw = (cut * w).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y0 = jnp.clip(cy - ch // 2, 0, h)
    y1 = jnp.clip(cy + ch // 2, 0, h)
    x0 = jnp.clip(cx - cw // 2, 0, w)
    x1 = jnp.clip(cx + cw // 2, 0, w)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    box = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
    lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / float(h * w)
    return box, lam_adj


def build_mixup(cfg: dict):
    """cfg keys (timm Mixup names): ``alpha`` (mixup Beta, 0 = off),
    ``cutmix_alpha`` (0 = off), ``prob`` (apply chance per step, default 1),
    ``switch_prob`` (chance of CutMix when both are on, default 0.5).

    Returns ``mix(x, key, mask=None) -> (mixed_x, lam, partner)``; the caller
    gathers ``labels[partner]`` for the secondary loss term. ``partner`` is
    the reversed index, or the row's own index where the reversed row is
    masked out (see module docstring).
    """
    alpha = float(cfg.get("alpha", 0.0))
    cutmix_alpha = float(cfg.get("cutmix_alpha", 0.0))
    prob = float(cfg.get("prob", 1.0))
    switch_prob = float(cfg.get("switch_prob", 0.5))
    if alpha <= 0.0 and cutmix_alpha <= 0.0:
        raise ValueError("mixup config needs alpha > 0 and/or cutmix_alpha > 0")

    def mix(x, key, mask=None):
        k_apply, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(key, 5)
        b = x.shape[0]
        rev = jnp.arange(b)[::-1]
        if mask is None:
            partner = rev
        else:
            partner = jnp.where(mask[rev], rev, jnp.arange(b))
        flipped = x[partner]
        h, w = x.shape[1], x.shape[2]

        use_cutmix = (
            jnp.asarray(cutmix_alpha > 0.0)
            if alpha <= 0.0
            else (jax.random.bernoulli(k_switch, switch_prob)
                  if cutmix_alpha > 0.0 else jnp.asarray(False))
        )

        def do_mixup(_):
            lam = jax.random.beta(k_lam_m, max(alpha, 1e-8), max(alpha, 1e-8))
            xf = x.astype(jnp.float32)
            mixed = lam * xf + (1.0 - lam) * flipped.astype(jnp.float32)
            return mixed.astype(x.dtype), lam.astype(jnp.float32)

        def do_cutmix(_):
            lam0 = jax.random.beta(
                k_lam_c, max(cutmix_alpha, 1e-8), max(cutmix_alpha, 1e-8))
            box, lam = _rand_box(k_box, h, w, lam0)
            mixed = jnp.where(box[None, :, :, None], flipped, x)
            return mixed, lam

        mixed, lam = jax.lax.cond(use_cutmix, do_cutmix, do_mixup, None)
        apply = jax.random.bernoulli(k_apply, prob)
        mixed = jnp.where(apply, mixed, x)
        lam = jnp.where(apply, lam, 1.0)
        return mixed, lam, partner

    return mix
