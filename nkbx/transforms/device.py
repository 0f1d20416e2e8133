"""Device-stage augmentation: ONE fused, batched, jitted kernel on TPU.

Replaces per-sample albumentations CPU ops (reference dataset.py:89-102). The whole
random photometric chain (flips, brightness/contrast, HSV jitter, coarse dropout,
motion blur, normalize) compiles to a single XLA program over a uint8 NHWC batch —
elementwise ops fuse into a few VPU passes, no host round-trips, per-sample
randomness from a single JAX PRNG key.

Numerical notes vs albumentations:
- albumentations quantizes to uint8 after every op; we stay in float32 and clip to
  [0, 255] at each op boundary (differences are below quantization noise — see
  tests/test_transforms.py tolerances);
- HSV uses the cv2-uint8 convention (H in [0, 180), S/V in [0, 255]) so the
  configured shift limits mean the same thing.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nkbx.transforms import spec as S


# ---------------------------------------------------------------------------
# Color space (cv2-uint8 convention, float math)
# ---------------------------------------------------------------------------


def rgb_to_hsv(x):
    """RGB float [0,255] -> (H in [0,180), S in [0,255], V in [0,255])."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    h_r = jnp.mod((g - b) / safe, 6.0)
    h_g = (b - r) / safe + 2.0
    h_b = (r - g) / safe + 4.0
    h6 = jnp.where(mx == r, h_r, jnp.where(mx == g, h_g, h_b))
    h = jnp.where(diff == 0, 0.0, h6 * 30.0)  # [0, 180)
    s = jnp.where(mx > 0, 255.0 * diff / jnp.where(mx == 0, 1.0, mx), 0.0)
    v = mx
    return h, s, v


def hsv_to_rgb(h, s, v):
    """Inverse of :func:`rgb_to_hsv`."""
    h6 = h / 30.0
    c = v * (s / 255.0)
    xm = c * (1.0 - jnp.abs(jnp.mod(h6, 2.0) - 1.0))
    m = v - c
    sector = jnp.floor(h6).astype(jnp.int32) % 6
    r = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3, sector == 4], [c, xm, 0.0, 0.0, xm], c)
    g = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3, sector == 4], [xm, c, c, xm, 0.0], 0.0)
    b = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3, sector == 4], [0.0, 0.0, xm, c, c], xm)
    return jnp.stack([r + m, g + m, b + m], axis=-1)


# ---------------------------------------------------------------------------
# Per-op appliers. Each takes (x f32 NHWC [0,255], key) -> x.
# ---------------------------------------------------------------------------


def _gate(key, p, b):
    """Per-sample Bernoulli(p) gate, shape (B, 1, 1, 1)."""
    return (jax.random.uniform(key, (b, 1, 1, 1)) < p).astype(jnp.float32)


def _apply_hflip(t: S.HorizontalFlip, x, key):
    # jnp.where keeps the op dtype-preserving, so flips run on the raw uint8
    # batch (3 bytes/px) instead of a float32 intermediate (12 bytes/px)
    g = jax.random.uniform(key, (x.shape[0], 1, 1, 1)) < t.p
    return jnp.where(g, x[:, :, ::-1, :], x)


def _apply_vflip(t: S.VerticalFlip, x, key):
    g = jax.random.uniform(key, (x.shape[0], 1, 1, 1)) < t.p
    return jnp.where(g, x[:, ::-1, :, :], x)


def _apply_brightness_contrast(t: S.RandomBrightnessContrast, x, key):
    (b_lo, b_hi), (c_lo, c_hi) = t.ranges()
    k_g, k_a, k_b = jax.random.split(key, 3)
    bsz = x.shape[0]
    g = _gate(k_g, t.p, bsz)
    alpha = 1.0 + jax.random.uniform(k_a, (bsz, 1, 1, 1), minval=c_lo, maxval=c_hi)
    beta = jax.random.uniform(k_b, (bsz, 1, 1, 1), minval=b_lo, maxval=b_hi)
    if t.brightness_by_max:
        y = x * alpha + beta * 255.0
    else:
        # brightness relative to current mean, as albumentations does
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        y = x * alpha + beta * mean
    y = jnp.clip(y, 0.0, 255.0)
    return x * (1.0 - g) + y * g


def _apply_hsv(t: S.HueSaturationValue, x, key):
    (h_lo, h_hi), (s_lo, s_hi), (v_lo, v_hi) = t.ranges()
    k_g, k_h, k_s, k_v = jax.random.split(key, 4)
    bsz = x.shape[0]
    g = _gate(k_g, t.p, bsz)
    dh = jax.random.uniform(k_h, (bsz, 1, 1), minval=h_lo, maxval=h_hi)
    ds = jax.random.uniform(k_s, (bsz, 1, 1), minval=s_lo, maxval=s_hi)
    dv = jax.random.uniform(k_v, (bsz, 1, 1), minval=v_lo, maxval=v_hi)
    h, s, v = rgb_to_hsv(x)
    h = jnp.mod(h + dh, 180.0)
    s = jnp.clip(s + ds, 0.0, 255.0)
    v = jnp.clip(v + dv, 0.0, 255.0)
    y = jnp.clip(hsv_to_rgb(h, s, v), 0.0, 255.0)
    return x * (1.0 - g) + y * g


def _apply_coarse_dropout(t: S.CoarseDropout, x, key):
    bsz, ih, iw, c = x.shape
    min_holes, max_holes, min_h, max_h, min_w, max_w = t.resolved(ih, iw)
    k_g, k_n, k_h, k_w, k_y, k_x = jax.random.split(key, 6)
    g = _gate(k_g, t.p, bsz)  # (B,1,1,1)
    n_holes = jax.random.randint(k_n, (bsz, 1), min_holes, max_holes + 1)
    hh = jax.random.uniform(k_h, (bsz, max_holes), minval=min_h, maxval=max_h)
    ww = jax.random.uniform(k_w, (bsz, max_holes), minval=min_w, maxval=max_w)
    hh = jnp.floor(hh)
    ww = jnp.floor(ww)
    y1 = jax.random.uniform(k_y, (bsz, max_holes)) * jnp.maximum(ih - hh, 1.0)
    x1 = jax.random.uniform(k_x, (bsz, max_holes)) * jnp.maximum(iw - ww, 1.0)
    y1, x1 = jnp.floor(y1), jnp.floor(x1)
    hole_active = (jnp.arange(max_holes)[None, :] < n_holes).astype(jnp.float32)  # (B, n)

    rows = jax.lax.broadcasted_iota(jnp.float32, (1, 1, ih, 1), 2)  # (1,1,H,1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, iw), 3)  # (1,1,1,W)
    y1e = y1[:, :, None, None]
    x1e = x1[:, :, None, None]
    in_rows = (rows >= y1e) & (rows < y1e + hh[:, :, None, None])  # (B,n,H,1)
    in_cols = (cols >= x1e) & (cols < x1e + ww[:, :, None, None])  # (B,n,1,W)
    holes = in_rows & in_cols  # (B,n,H,W)
    holes = holes & (hole_active[:, :, None, None] > 0)
    mask = jnp.any(holes, axis=1)[..., None].astype(jnp.float32)  # (B,H,W,1)
    mask = mask * g
    fill = jnp.asarray(t.fill_value, dtype=jnp.float32)
    fill = jnp.broadcast_to(fill, (c,)) if fill.ndim <= 1 else fill
    return x * (1.0 - mask) + fill[None, None, None, :] * mask


def _apply_motion_blur(t: S.MotionBlur, x, key):
    """Random straight-line blur through the kernel center.

    Albumentations rasterizes a random line with cv2.line; we rasterize a centered
    line at a random angle with random odd length from ``blur_limit`` — same blur
    family, batched on device via a depthwise conv.
    """
    ksizes = t.ksizes()
    kmax = max(ksizes)
    bsz, ih, iw, c = x.shape
    k_g, k_len, k_ang, k_off = jax.random.split(key, 4)
    g = _gate(k_g, t.p, bsz)
    length = jnp.asarray(ksizes)[jax.random.randint(k_len, (bsz,), 0, len(ksizes))]  # odd
    theta = jax.random.uniform(k_ang, (bsz,), minval=0.0, maxval=np.pi)

    # Rasterize per-sample line kernels (B, kmax, kmax)
    yy = jax.lax.broadcasted_iota(jnp.float32, (kmax, kmax), 0) - (kmax - 1) / 2.0
    xx = jax.lax.broadcasted_iota(jnp.float32, (kmax, kmax), 1) - (kmax - 1) / 2.0
    dy, dx = jnp.sin(theta), jnp.cos(theta)  # (B,)
    half = (length.astype(jnp.float32) - 1.0) / 2.0
    if getattr(t, "allow_shifted", True):
        # albumentations allow_shifted: the line may sit off-center INSIDE the
        # SAMPLED k×k kernel (not the kmax canvas) — bound the center offset so
        # both endpoints stay within the sampled kernel box around the canvas
        # center: per-axis limit = (k-1)/2 − half·|direction| = half·(1−|d|)
        lim_y = half * (1.0 - jnp.abs(dy))
        lim_x = half * (1.0 - jnp.abs(dx))
        off = jax.random.uniform(k_off, (bsz, 2), minval=-1.0, maxval=1.0)
        oy = off[:, 0] * lim_y
        ox = off[:, 1] * lim_x
    else:
        oy = ox = jnp.zeros((bsz,), jnp.float32)
    yc = yy[None] - oy[:, None, None]
    xc = xx[None] - ox[:, None, None]
    # distance from pixel center to the line, and projection along it
    dist = jnp.abs(yc * dx[:, None, None] - xc * dy[:, None, None])
    proj = jnp.abs(yc * dy[:, None, None] + xc * dx[:, None, None])
    kern = ((dist <= 0.5) & (proj <= half[:, None, None] + 0.25)).astype(jnp.float32)
    kern = kern / jnp.maximum(jnp.sum(kern, axis=(1, 2), keepdims=True), 1.0)

    # Per-sample kernels applied as a static shift-and-accumulate: y = sum_ij
    # kern[:, i, j] * shifted(x). K*K fused multiply-adds on the VPU — avoids a
    # batched grouped conv (which XLA handles poorly for per-sample kernels).
    pad = kmax // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    y = jnp.zeros_like(x)
    for i in range(kmax):
        for j in range(kmax):
            w = kern[:, i, j][:, None, None, None]
            y = y + w * jax.lax.dynamic_slice(xp, (0, i, j, 0), x.shape)
    y = jnp.clip(y, 0.0, 255.0)
    return x * (1.0 - g) + y * g


def _apply_shadow(t: S.RandomShadow, x, key):
    bsz, ih, iw, _ = x.shape
    x1r, y1r, x2r, y2r = t.shadow_roi
    n_max = max(1, t.num_shadows_upper)
    k_g, k_n, k_c, k_ab, k_th = jax.random.split(key, 5)
    g = _gate(k_g, t.p, bsz)
    n_shadows = jax.random.randint(k_n, (bsz, 1), t.num_shadows_lower, t.num_shadows_upper + 1)
    # shadow centers inside the ROI, random rotated-rect half-extents and angle
    cy = jax.random.uniform(k_c, (bsz, n_max, 2))
    cx = (x1r + cy[..., 0] * (x2r - x1r)) * iw
    cyy = (y1r + cy[..., 1] * (y2r - y1r)) * ih
    ab = jax.random.uniform(k_ab, (bsz, n_max, 2), minval=0.1, maxval=0.35)
    a = ab[..., 0] * iw
    b = ab[..., 1] * ih
    theta = jax.random.uniform(k_th, (bsz, n_max), maxval=np.pi)
    rows = jax.lax.broadcasted_iota(jnp.float32, (1, 1, ih, 1), 2)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, iw), 3)
    dy = rows - cyy[:, :, None, None]
    dx = cols - cx[:, :, None, None]
    ct, st = jnp.cos(theta)[:, :, None, None], jnp.sin(theta)[:, :, None, None]
    u = dx * ct + dy * st
    v = -dx * st + dy * ct
    inside = (jnp.abs(u) < a[:, :, None, None]) & (jnp.abs(v) < b[:, :, None, None])
    active = (jnp.arange(n_max)[None, :] < n_shadows)[:, :, None, None]
    mask = jnp.any(inside & active, axis=1)[..., None].astype(jnp.float32) * g
    return x * (1.0 - mask * t.shadow_intensity)


def _apply_fog(t: S.RandomFog, x, key):
    k_g, k_f = jax.random.split(key)
    bsz = x.shape[0]
    g = _gate(k_g, t.p, bsz)
    f = jax.random.uniform(k_f, (bsz, 1, 1, 1), minval=t.fog_coef_lower, maxval=t.fog_coef_upper)
    y = x * (1.0 - f) + 255.0 * f
    return x * (1.0 - g) + y * g


def _apply_rain(t: S.RandomRain, x, key):
    bsz, ih, iw, c = x.shape
    k_g, k_noise, k_slant = jax.random.split(key, 3)
    g = _gate(k_g, t.p, bsz)
    density = 0.002  # fraction of streak seeds
    seeds = (jax.random.uniform(k_noise, (bsz, ih, iw, 1)) < density).astype(jnp.float32)
    slant = jax.random.randint(k_slant, (bsz,), t.slant_lower, t.slant_upper + 1)
    # smear seeds along the slant over drop_length steps (static loop, fused adds)
    streaks = jnp.zeros_like(seeds)
    steps = max(1, min(t.drop_length, ih))
    for i in range(steps):
        dx = (slant * i) // max(steps - 1, 1)
        shifted = jnp.roll(seeds, shift=i, axis=1)
        # per-sample horizontal shift via take_along_axis-free roll on a vmapped axis
        shifted = jax.vmap(lambda im, d: jnp.roll(im, d, axis=1))(shifted, dx)
        streaks = jnp.maximum(streaks, shifted)
    color = jnp.asarray(t.drop_color, jnp.float32)
    y = x * t.brightness_coefficient
    y = y * (1.0 - streaks) + color[None, None, None, :] * streaks
    y = jnp.clip(y, 0.0, 255.0)
    return x * (1.0 - g) + y * g


def _reflect101_index(i, n: int):
    """BORDER_REFLECT_101 index folding (period 2n-2, no edge duplication)."""
    if n == 1:
        return jnp.zeros_like(i)
    period = 2 * n - 2
    i = jnp.abs(jnp.mod(i, period))
    return jnp.minimum(i, period - i)


def _bilinear_gather(x, src_y, src_x, mode: str, cval: float):
    """Bilinear sample of (B, H, W, C) at PER-SAMPLE float coords (B, H, W).

    Per-sample warp grids are inherently point gathers, which this backend
    lowers slowly (~260 ms/batch at bs=128 @224 regardless of formulation —
    measured both the scipy map_coordinates and flat take_along_axis forms);
    use :func:`_shared_bilinear_gather` whenever the grid is shared across
    the batch (RandAugment draws affine params per round for this reason).
    """
    from jax.scipy.ndimage import map_coordinates

    def one_plane(img2d, sy, sx):
        return map_coordinates(img2d, [sy, sx], order=1, mode=mode, cval=cval)

    def one_sample(img, sy, sx):
        return jax.vmap(lambda p: one_plane(p, sy, sx))(
            img.transpose(2, 0, 1)).transpose(1, 2, 0)

    return jax.vmap(one_sample)(x, src_y, src_x)


def _shared_bilinear_gather(x, src_y, src_x, mode: str, cval: float):
    """Bilinear sample with ONE (H, W) coord grid shared by the whole batch.

    The four corner taps become row gathers over a (H*W, B*C) layout —
    each gathered row is B*C lanes wide (the embedding-lookup pattern
    XLA:TPU lowers efficiently), unlike per-sample point gathers.
    """
    b, h, w, c = x.shape
    y0f = jnp.floor(src_y)
    x0f = jnp.floor(src_x)
    wy = (src_y - y0f)[:, :, None]
    wx = (src_x - x0f)[:, :, None]
    y0, x0 = y0f.astype(jnp.int32), x0f.astype(jnp.int32)
    wide = x.transpose(1, 2, 0, 3).reshape(h * w, b * c)

    def tap(yi, xi):
        if mode == "mirror":
            yc = _reflect101_index(yi, h)
            xc = _reflect101_index(xi, w)
            valid = None
        else:  # constant
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[:, :, None]
        v = wide[(yc * w + xc).reshape(-1)].reshape(h, w, b * c)
        if valid is not None:
            v = jnp.where(valid, v, cval)
        return v

    top = tap(y0, x0) * (1.0 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1.0 - wx) + tap(y0 + 1, x0 + 1) * wx
    out = top * (1.0 - wy) + bot * wy
    return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)


def _shared_nearest_gather(x, src_y, src_x, cval: float):
    """Nearest-neighbor variant of :func:`_shared_bilinear_gather` (single
    tap — what torchvision RandAugment's default interpolation uses)."""
    b, h, w, c = x.shape
    yi = jnp.round(src_y).astype(jnp.int32)
    xi = jnp.round(src_x).astype(jnp.int32)
    valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[:, :, None]
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)
    wide = x.transpose(1, 2, 0, 3).reshape(h * w, b * c)
    v = wide[(yc * w + xc).reshape(-1)].reshape(h, w, b * c)
    v = jnp.where(valid, v, cval)
    return v.reshape(h, w, b, c).transpose(2, 0, 1, 3)


def _affine_sample(x, angle_deg, scale, tx, ty, mode: str, cval: float):
    """Per-sample inverse-affine bilinear resample about the image center.

    Forward map (cv2.warpAffine with getRotationMatrix2D + translation):
    dst = s*R(angle)*(src - c) + c + t; we gather with the inverse
    src = R(-angle)*(dst - c - t)/s + c. ``mode`` 'mirror' is scipy's
    BORDER_REFLECT_101 equivalent; 'constant' fills ``cval``.
    """
    b, h, w, c = x.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    rad = angle_deg * (np.pi / 180.0)
    cos = jnp.cos(rad).reshape(b, 1, 1)
    sin = jnp.sin(rad).reshape(b, 1, 1)
    s = scale.reshape(b, 1, 1)
    dx = (xs[None] - cx - tx.reshape(b, 1, 1))
    dy = (ys[None] - cy - ty.reshape(b, 1, 1))
    # cv2.getRotationMatrix2D forward is [[cos, sin], [-sin, cos]] (positive
    # angle = counter-clockwise in image coords); dst->src uses its inverse
    src_x = (cos * dx - sin * dy) / s + cx
    src_y = (sin * dx + cos * dy) / s + cy
    return _bilinear_gather(x, src_y, src_x, mode, cval)


_BORDER_MODES = {"reflect101": "mirror", "constant": "constant"}


# ---------------------------------------------------------------------------
# RandAugment (torchvision op set and magnitude ranges)
# ---------------------------------------------------------------------------

# op ids (torchvision transforms.RandAugment._augmentation_space order)
_RA_IDENTITY, _RA_SHEAR_X, _RA_SHEAR_Y, _RA_TRANS_X, _RA_TRANS_Y, _RA_ROTATE, \
    _RA_BRIGHT, _RA_COLOR, _RA_CONTRAST, _RA_SHARP, _RA_POSTERIZE, \
    _RA_SOLARIZE, _RA_AUTOCONTRAST, _RA_EQUALIZE = range(14)
_RA_NUM_OPS = 14


def _ra_gray(x):
    return (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]


def _ra_blend(base, img, factor):
    """torchvision _blend: base + factor*(img-base), clipped."""
    return jnp.clip(base + factor * (img - base), 0.0, 255.0)


def _ra_posterize(x, bits):
    step = 2.0 ** (8.0 - bits.reshape(-1, 1, 1, 1))
    return jnp.floor(jnp.floor(x) / step) * step


def _ra_solarize(x, thr):
    return jnp.where(x >= thr.reshape(-1, 1, 1, 1), 255.0 - x, x)


def _ra_autocontrast(x):
    mn = jnp.min(x, axis=(1, 2), keepdims=True)
    mx = jnp.max(x, axis=(1, 2), keepdims=True)
    scale = 255.0 / jnp.where(mx > mn, mx - mn, 1.0)
    return jnp.where(mx > mn, (x - mn) * scale, x)


def _ra_equalize(x):
    """PIL ImageOps.equalize per sample/channel (integer-LUT semantics).

    Histogram + LUT apply are formulated as MXU matmuls over hi/lo-nibble
    one-hots: hist[v] = sum_p [hi(p)==hi(v)][lo(p)==lo(v)] is a (16, N) x
    (N, 16) contraction per row, and lut[q[p]] = A[p] @ LUT_16x16 @ B[p]^T.
    This replaces the (N x 256) broadcast-compare-reduce (32 compares/pixel
    vs 256) and routes the contraction through the MXU; LUT values <= 255 and
    one-hots are exact in bf16, counts accumulate in f32
    (preferred_element_type), so the result is bit-exact vs PIL.
    """
    b, h, w, c = x.shape
    q = jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32)
    flat = q.transpose(0, 3, 1, 2).reshape(b * c, h * w)
    nibbles = jnp.arange(16, dtype=jnp.int32)[None, None, :]
    hi = ((flat >> 4)[:, :, None] == nibbles).astype(jnp.bfloat16)  # (R, N, 16)
    lo = ((flat & 15)[:, :, None] == nibbles).astype(jnp.bfloat16)  # (R, N, 16)
    hist = jnp.einsum("rnh,rnl->rhl", hi, lo,
                      preferred_element_type=jnp.float32)
    hist = hist.reshape(b * c, 256).astype(jnp.int32)  # bin v = hi*16 + lo
    nonzero = hist > 0
    # PIL: step = (n_pixels - count_of_LAST_NONZERO_bin) // 255
    last_nz = 255 - jnp.argmax(nonzero[:, ::-1], axis=1)
    last_count = jnp.take_along_axis(hist, last_nz[:, None], axis=1)[:, 0]
    step = (h * w - last_count) // 255
    csum = jnp.cumsum(hist, axis=1) - hist  # exclusive prefix sum
    lut = jnp.clip((step[:, None] // 2 + csum) // jnp.maximum(step, 1)[:, None],
                   0, 255)
    identity = (step <= 0) | (jnp.sum(nonzero, axis=1) <= 1)
    lut = jnp.where(identity[:, None], jnp.arange(256)[None, :], lut)
    # out[p] = A[p] @ LUT @ B[p]^T: one (N,16)x(16,16) MXU matmul per row,
    # then a 16-lane masked reduce — no per-pixel 256-entry table gather
    lutmat = lut.reshape(b * c, 16, 16).astype(jnp.bfloat16)
    tmp = jnp.einsum("rnh,rhl->rnl", hi, lutmat,
                     preferred_element_type=jnp.float32)
    out = jnp.sum(tmp * lo.astype(jnp.float32), axis=2)
    return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)


def _ra_sharpness(x, factor):
    """torchvision adjust_sharpness: blend with a 3x3 [[1,1,1],[1,5,1],[1,1,1]]/13
    smoothing whose border ring keeps the original pixels."""
    k = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    kernel = jnp.zeros((3, 3, x.shape[-1], x.shape[-1]))
    for ci in range(x.shape[-1]):
        kernel = kernel.at[:, :, ci, ci].set(k)
    sm = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    sm = jnp.clip(jnp.round(sm), 0.0, 255.0)  # torchvision rounds the blur
    border = jnp.zeros(x.shape[1:3], bool).at[1:-1, 1:-1].set(True)
    sm = jnp.where(border[None, :, :, None], sm, x)
    return _ra_blend(sm, x, factor.reshape(-1, 1, 1, 1))


# number of affine-op ids (_RA_SHEAR_X .. _RA_ROTATE are ids 1..5)
_RA_N_AFFINE = 5


def _ra_affine_specs(key, n_grids: int, h: int, w: int, frac, trans_frac=None):
    """Draw ``n_grids`` shared affine-grid specs for one policy round.

    Each grid is an independent (op ~ U{shear_x, shear_y, trans_x, trans_y,
    rotate}, sign ~ +-1) draw at magnitude fraction ``frac`` — a scalar
    (RandAugment's fixed magnitude) or a per-grid (K,) draw (TrivialAugment's
    random bins). A sample that lands on an affine op picks one grid uniformly,
    so its (op, signed magnitude) marginals are exactly torchvision's; only
    the within-batch support is limited to K combinations (the batch-mode
    tradeoff that keeps warp grids shared — per-sample grids are point
    gathers this backend lowers ~47x slower, PERF.md).
    """
    k_op, k_sign = jax.random.split(key)
    aop = jax.random.randint(k_op, (n_grids,), _RA_SHEAR_X, _RA_ROTATE + 1)
    s = jnp.where(jax.random.bernoulli(k_sign, 0.5, (n_grids,)), 1.0, -1.0)
    frac = jnp.broadcast_to(jnp.asarray(frac, jnp.float32), (n_grids,))
    if trans_frac is None:
        trans_frac = frac
    else:
        trans_frac = jnp.broadcast_to(jnp.asarray(trans_frac, jnp.float32),
                                      (n_grids,))
    return {
        "aop": aop,
        "shear_v": 0.3 * frac * s,
        # torchvision translates by an INTEGER pixel count
        "trans_x": jnp.floor(150.0 / 331.0 * w * trans_frac) * s,
        "trans_y": jnp.floor(150.0 / 331.0 * h * trans_frac) * s,
        "rot_deg": 30.0 * frac * s,
    }


def _taw_affine_specs(key, n_grids: int, num_bins: int):
    """TrivialAugmentWide grid specs: per-grid random magnitude bin at the
    wide ranges (shear 0.99, translate 32 px, rotate 135)."""
    k_op, k_mag, k_sign = jax.random.split(key, 3)
    aop = jax.random.randint(k_op, (n_grids,), _RA_SHEAR_X, _RA_ROTATE + 1)
    m = jax.random.randint(k_mag, (n_grids,), 0, num_bins).astype(jnp.float32)
    fr = m / max(num_bins - 1, 1)
    s = jnp.where(jax.random.bernoulli(k_sign, 0.5, (n_grids,)), 1.0, -1.0)
    return {
        "aop": aop,
        "shear_v": 0.99 * fr * s,
        # torchvision's _apply_op truncates the translate to int
        "trans_x": jnp.floor(32.0 * fr) * s,
        "trans_y": jnp.floor(32.0 * fr) * s,
        "rot_deg": 135.0 * fr * s,
    }


def _taw_point_mags(key, b: int, num_bins: int):
    """TrivialAugmentWide pointwise magnitudes, PER SAMPLE (free for
    elementwise ops — only warps need batch-shared grids)."""
    k_mag, k_sign = jax.random.split(key)
    m = jax.random.randint(k_mag, (b,), 0, num_bins).astype(jnp.float32)
    fr = m / max(num_bins - 1, 1)
    s = jnp.where(jax.random.bernoulli(k_sign, 0.5, (b,)), 1.0, -1.0)
    return {
        "color_v": 0.99 * fr * s,
        "post_bits": 8.0 - jnp.round(m / ((num_bins - 1) / 6)),
        "solar_thr": 255.0 * (1.0 - fr),
    }


def _policy_round(x, key, point_mags_fn, affine_specs_fn, n_grids: int):
    """One policy round over the 14-op table.

    Per sample: WHICH op, the pointwise magnitude/sign (``point_mags_fn(key,
    b)`` -> per-sample (B,) color_v/post_bits/solar_thr), and — for affine
    ops — WHICH of the ``n_grids`` shared warp grids (``affine_specs_fn(key)``
    -> per-grid (K,) op/magnitude draws, see _ra_affine_specs). NEAREST
    sampling and top-left-anchored shears match torchvision's defaults.
    """
    b, h, w, _ = x.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys_g = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs_g = jnp.arange(w, dtype=jnp.float32)[None, :]

    k_op, k_assign, k_point, k_aff = jax.random.split(key, 4)
    op = jax.random.randint(k_op, (b,), 0, _RA_NUM_OPS)
    assign = jax.random.randint(k_assign, (b,), 0, n_grids)
    pm = point_mags_fn(k_point, b)
    aff = affine_specs_fn(k_aff)

    is_affine = (op >= _RA_SHEAR_X) & (op <= _RA_ROTATE)
    y = x
    for k in range(n_grids):
        aop = aff["aop"][k]
        sh = aff["shear_v"][k]
        rad = jnp.deg2rad(aff["rot_deg"][k])
        cos, sin = jnp.cos(rad), jnp.sin(rad)
        is_shx = aop == _RA_SHEAR_X
        is_shy = aop == _RA_SHEAR_Y
        is_rot = aop == _RA_ROTATE
        m00 = jnp.where(is_rot, cos, 1.0)
        m01 = jnp.where(is_shx, -sh, jnp.where(is_rot, -sin, 0.0))
        m10 = jnp.where(is_shy, -sh, jnp.where(is_rot, sin, 0.0))
        m11 = jnp.where(is_rot, cos, 1.0)
        tx = jnp.where(aop == _RA_TRANS_X, aff["trans_x"][k], 0.0)
        ty = jnp.where(aop == _RA_TRANS_Y, aff["trans_y"][k], 0.0)
        # shears anchor at the top-left (torchvision), rotate at the center;
        # translate is anchor-invariant
        tl = is_shx | is_shy
        ox = jnp.where(tl, 0.0, cx)
        oy = jnp.where(tl, 0.0, cy)
        dx = xs_g - ox - tx
        dy = ys_g - oy - ty
        src_x = m00 * dx + m01 * dy + ox
        src_y = m10 * dx + m11 * dy + oy
        warped = _shared_nearest_gather(x, src_y, src_x, 0.0)
        y = jnp.where((is_affine & (assign == k))[:, None, None, None], warped, y)

    # ---- pointwise sub-ops (per-sample magnitude and sign) ----
    f = (1.0 + pm["color_v"]).reshape(b, 1, 1, 1)

    def sel(op_id, val):
        return jnp.where((op == op_id)[:, None, None, None], val, y)

    y = sel(_RA_BRIGHT, _ra_blend(jnp.zeros_like(x), x, f))
    y = sel(_RA_COLOR, _ra_blend(_ra_gray(x), x, f))
    mean_gray = jnp.mean(jnp.round(_ra_gray(x)), axis=(1, 2, 3), keepdims=True)
    y = sel(_RA_CONTRAST, _ra_blend(mean_gray, x, f))
    y = sel(_RA_SHARP, _ra_sharpness(x, f))
    y = sel(_RA_POSTERIZE, _ra_posterize(x, jnp.broadcast_to(pm["post_bits"], (b,))))
    y = sel(_RA_SOLARIZE, _ra_solarize(x, jnp.broadcast_to(pm["solar_thr"], (b,))))
    y = sel(_RA_AUTOCONTRAST, _ra_autocontrast(x))
    y = sel(_RA_EQUALIZE, _ra_equalize(x))
    return jnp.clip(y, 0.0, 255.0)


def _apply_randaugment(t: S.RandAugment, x, key):
    b, h, w, _ = x.shape
    frac = t.magnitude / max(t.num_magnitude_bins - 1, 1)
    pb = 8.0 - round(t.magnitude / ((t.num_magnitude_bins - 1) / 4))
    st = 255.0 * (1.0 - frac)

    def point_mags(k, bb):
        # magnitude is fixed; only the sign of the signed ops is per sample
        s = jnp.where(jax.random.bernoulli(k, 0.5, (bb,)), 1.0, -1.0)
        return {"color_v": 0.9 * frac * s,
                "post_bits": jnp.full((bb,), pb),
                "solar_thr": jnp.full((bb,), st)}

    def affine_specs(k):
        return _ra_affine_specs(k, t.num_affine_grids, h, w, frac)

    k_gate, key = jax.random.split(key)
    gate = _gate(k_gate, t.p, b)

    def round_fn(xc, k):
        return _policy_round(xc, k, point_mags, affine_specs,
                             t.num_affine_grids), None

    if t.num_ops > 1:
        # lax.scan compiles the round body ONCE: chaining unrolled rounds in
        # one fused program triggered an XLA recompute/spill pathology
        # (num_ops=2 measured ~6x over 2x one round, PERF.md round 2)
        y, _ = jax.lax.scan(round_fn, x, jax.random.split(key, t.num_ops))
    else:
        y, _ = round_fn(x, key)
    return x * (1.0 - gate) + y * gate


def _apply_trivialaugment(t: S.TrivialAugmentWide, x, key):
    """torchvision TrivialAugmentWide: ONE op per image at a PER-IMAGE
    uniformly random magnitude bin, with the wide ranges (shear 0.99,
    translate 32 px, rotate 135, color 0.99, posterize down to 2 bits).
    Pointwise magnitudes are exactly per-sample; affine magnitudes are
    bucketed over ``num_affine_grids`` shared warp grids (exact per-sample
    marginals, K-limited within-batch support — see _ra_affine_specs)."""
    b = x.shape[0]
    k_gate, k_round = jax.random.split(key)
    gate = _gate(k_gate, t.p, b)

    def point_mags(k, bb):
        return _taw_point_mags(k, bb, t.num_magnitude_bins)

    def affine_specs(k):
        return _taw_affine_specs(k, t.num_affine_grids, t.num_magnitude_bins)

    y = _policy_round(x, k_round, point_mags, affine_specs, t.num_affine_grids)
    return x * (1.0 - gate) + y * gate


def _apply_rotate(t: S.Rotate, x, key):
    lo, hi = t.range()
    k_g, k_a = jax.random.split(key)
    b = x.shape[0]
    g = _gate(k_g, t.p, b)
    angle = jax.random.uniform(k_a, (b,), minval=lo, maxval=hi)
    y = _affine_sample(x, angle, jnp.ones(b), jnp.zeros(b), jnp.zeros(b),
                       _BORDER_MODES[t.border_mode], float(t.value))
    return x * (1.0 - g) + y * g


def _apply_shift_scale_rotate(t: S.ShiftScaleRotate, x, key):
    (sh_lo, sh_hi), (sc_lo, sc_hi), (r_lo, r_hi) = t.ranges()
    k_g, k_s, k_c, k_r = jax.random.split(key, 4)
    b, h, w, _ = x.shape
    g = _gate(k_g, t.p, b)
    shift = jax.random.uniform(k_s, (b, 2), minval=sh_lo, maxval=sh_hi)
    scale = 1.0 + jax.random.uniform(k_c, (b,), minval=sc_lo, maxval=sc_hi)
    angle = jax.random.uniform(k_r, (b,), minval=r_lo, maxval=r_hi)
    y = _affine_sample(x, angle, scale, shift[:, 0] * w, shift[:, 1] * h,
                       _BORDER_MODES[t.border_mode], float(t.value))
    return x * (1.0 - g) + y * g


# ---------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------

_RANDOM_APPLIERS = {
    S.HorizontalFlip: _apply_hflip,
    S.VerticalFlip: _apply_vflip,
    S.RandomBrightnessContrast: _apply_brightness_contrast,
    S.HueSaturationValue: _apply_hsv,
    S.CoarseDropout: _apply_coarse_dropout,
    S.Rotate: _apply_rotate,
    S.ShiftScaleRotate: _apply_shift_scale_rotate,
    S.RandAugment: _apply_randaugment,
    S.TrivialAugmentWide: _apply_trivialaugment,
    S.MotionBlur: _apply_motion_blur,
    S.RandomShadow: _apply_shadow,
    S.RandomFog: _apply_fog,
    S.RandomRain: _apply_rain,
}


def build_device_fn(transforms: Sequence[S.Transform]):
    """Compile the device-stage chain to one jitted fn(batch_u8, key, train)."""
    norm = None
    random_ops = []
    for t in transforms:
        if isinstance(t, S.Normalize):
            norm = t
        elif type(t) in _RANDOM_APPLIERS:
            random_ops.append(t)
        elif t.stage == S.MARKER:
            continue
        else:
            raise NotImplementedError(f"Device transform {type(t).__name__} not implemented")

    if norm is not None:
        mean = np.asarray(norm.mean, dtype=np.float32) * norm.max_pixel_value
        std = np.asarray(norm.std, dtype=np.float32) * norm.max_pixel_value
    else:
        mean = np.zeros(1, dtype=np.float32)
        std = np.ones(1, dtype=np.float32)

    # flips are dtype-preserving selects — run them on the raw uint8 batch
    # (3 bytes/px) for as long as the op order allows; convert to float32 only
    # when the first photometric op needs it. The final normalize emits
    # ``out_dtype`` directly (bf16 for the train step), so the whole fast path
    # (flips + normalize) is uint8 reads + one bf16 write instead of three
    # float32 round-trips through HBM.
    _FLIPS = (S.HorizontalFlip, S.VerticalFlip)

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def device_fn(batch, key, train=True, out_dtype=jnp.float32):
        x = batch
        if train and random_ops:
            keys = jax.random.split(key, len(random_ops))
            for t, k in zip(random_ops, keys):
                if not isinstance(t, _FLIPS) and not jnp.issubdtype(x.dtype, jnp.floating):
                    x = x.astype(jnp.float32)
                x = _RANDOM_APPLIERS[type(t)](t, x, k)
        x = x.astype(jnp.float32)
        return ((x - mean) / std).astype(out_dtype)

    return device_fn
