"""Guidance loss library.

The six losses the reference's cond_fn combines (reference losses.py:1-54),
re-derived as pure jnp functions over NHWC arrays:

* squared spherical distance (CLIP guidance),
* L2 total variation with replicate padding,
* RGB range loss (defined-but-unused in the reference at losses.py:31-35;
  live here behind Config.range_scale),
* aesthetic loss (predictor head over L2-normalized CLIP embeddings),
* MS-SSIM structural dissimilarity (pytorch-msssim parity: 11-tap Gaussian
  window, 5 scales, standard weights),
* LPIPS perceptual loss lives with its VGG backbone in models/lpips.py.

All functions reduce the way the reference does, so loss *scales* transfer
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def square_spherical_distance_loss(x, y):
    """Squared spherical (great-circle chord) distance between L2-normalized
    embeddings: (||xn - yn||/2).arcsin()^2 * 2 (reference losses.py:10-16).

    Broadcasts like the reference call site (cuts, 1, D) x (1, P, D) ->
    (cuts, P)."""
    xn = l2_normalize(x, axis=-1)
    yn = l2_normalize(y, axis=-1)
    chord = jnp.linalg.norm(xn - yn, axis=-1)
    return jnp.arcsin(jnp.clip(chord / 2.0, -1.0, 1.0)) ** 2 * 2.0


def total_variational_loss(images):
    """L2 total variation with replicate edge padding, mean over pixels and
    channels, per batch element (reference losses.py:20-28). NHWC.

    Written as plain neighbor diffs, NOT `jnp.pad(mode="edge")` + diff:
    replicate padding makes the padded row/col diffs exactly zero, so
    summing the unpadded diffs over the same H*W*C denominator is the
    identical quantity — and the edge-mode pad lowers through a jitted
    `_pad` whose transpose breaks GSPMD batch-sharding propagation (the
    backward emitted a replicated cotangent + cross-device all-reduce,
    the ONLY collective in the pod-sharded guided step; slicing
    propagates the batch sharding cleanly and keeps the hot loop
    collective-free)."""
    dx = images[:, :, 1:, :] - images[:, :, :-1, :]
    dy = images[:, 1:, :, :] - images[:, :-1, :, :]
    n = images.shape[1] * images.shape[2] * images.shape[3]
    return (
        jnp.sum(dx**2, axis=(1, 2, 3)) + jnp.sum(dy**2, axis=(1, 2, 3))
    ) / n


def rgb_range_loss(images):
    """Penalize values outside [-1, 1] (reference losses.py:31-35)."""
    excess = images - jnp.clip(images, -1.0, 1.0)
    return jnp.mean(excess**2, axis=(1, 2, 3))


def aesthetic_loss(predictor_fn, embeddings):
    """Mean predictor score over L2-normalized embeddings (reference
    losses.py:43-45).  `predictor_fn` maps (N, D) -> (N, 1)."""
    return jnp.mean(predictor_fn(l2_normalize(embeddings, axis=-1)))


# --------------------------------------------------------------------------
# MS-SSIM (pytorch-msssim parity: win_size=11, win_sigma=1.5, data_range=1)
# --------------------------------------------------------------------------

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int, sigma: float):
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return jnp.asarray(g / g.sum(), dtype=jnp.float32)


def _blur(x, win):
    """Separable valid-mode Gaussian filter over H and W of NHWC."""
    k = win.shape[0]
    # depthwise: apply per-channel via feature_group_count
    c = x.shape[-1]
    kern_h = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c)).astype(x.dtype)
    kern_w = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c)).astype(x.dtype)
    x = jax.lax.conv_general_dilated(
        x, kern_h, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, kern_w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return x


def _ssim_components(x, y, win, data_range=1.0, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    sigma_x = _blur(x * x, win) - mu_x**2
    sigma_y = _blur(y * y, win) - mu_y**2
    sigma_xy = _blur(x * y, win) - mu_x * mu_y
    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim = ((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * cs
    return ssim, cs


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def ms_ssim(x, y, data_range=1.0, win_size=11, win_sigma=1.5):
    """Multi-scale SSIM over NHWC in [0,1]; returns scalar mean (the
    reference's MS_SSIM(size_average=True), losses.py:7).  Requires
    H, W >= win_size * 2**4 + ~10 (same constraint as pytorch-msssim)."""
    win = _gaussian_window(win_size, win_sigma)
    weights = jnp.asarray(_MSSSIM_WEIGHTS, dtype=x.dtype)
    levels = len(_MSSSIM_WEIGHTS)
    mcs = []
    ssim = None
    for i in range(levels):
        ssim, cs = _ssim_components(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jnp.mean(jax.nn.relu(cs)))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
    msv = jnp.mean(jax.nn.relu(ssim))
    mcs_stack = jnp.stack(mcs + [msv])
    return jnp.prod(mcs_stack ** weights)


def structural_dissimilarity_loss(images, target):
    """1 - MS-SSIM on [0,1]-denormalized images (reference losses.py:48-54).
    Inputs are [-1,1] NHWC like the call site."""
    x = (images + 1.0) / 2.0
    y = (target + 1.0) / 2.0
    return 1.0 - ms_ssim(x, y)
