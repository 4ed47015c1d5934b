"""Separable crop-and-resize as matrix multiplies — the TPU-native cutout op.

The reference's cutout engine slices a Python-random-sized crop out of the
image and runs resize-right's antialiased resampler on it, one cut at a time
(reference cutouts.py:84-108).  Data-dependent crop *shapes* cannot exist
under XLA, so this module reformulates crop+resize as a single fixed-shape
linear map:

    out = W_y(y0, size) @ image @ W_x(x0, size)^T

where the (out_size, in_size) weight matrices are computed *from data*
(traced crop coordinates/sizes) with static shapes.  Sampling an arbitrary
crop window therefore costs two MXU matmuls per cut — no gathers, no dynamic
shapes, no retracing — and is exactly linear in the image, so guidance
gradients flow through it for free.

Antialiasing follows the resize-right/PIL convention: the reconstruction
kernel is stretched by the downscale factor and every output row is
normalized over its valid support (which also yields correct edge handling).
Zero-padding (the reference pads the image to a square before overview
resizes, reference cutouts.py:54-64) is folded into the same weights via the
`pad` argument: virtual pad pixels participate in normalization but
contribute zero value.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

Method = Literal["linear", "cubic"]


def _kernel_linear(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _kernel_cubic(x, a: float = -0.5):
    """Catmull-Rom-family cubic (a=-0.5 matches PIL/resize-right bicubic)."""
    ax = jnp.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a
    return jnp.where(ax <= 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))


_KERNELS = {"linear": (_kernel_linear, 1.0), "cubic": (_kernel_cubic, 2.0)}


def axis_resize_weights(
    out_size: int,
    in_size: int,
    start,
    size,
    method: Method = "cubic",
    pad: int = 0,
    dtype=jnp.float32,
):
    """Resampling matrix for one axis: window [start, start+size) of a
    length-`in_size` axis (plus `pad` virtual zero pixels on each side)
    resized to `out_size` samples.

    `start`/`size` may be traced scalars (crop geometry is data); `out_size`,
    `in_size`, `pad` are static.  Returns (out_size, in_size) weights."""
    kernel, support = _KERNELS[method]
    start = jnp.asarray(start, jnp.float32)
    size = jnp.asarray(size, jnp.float32)

    i = jnp.arange(out_size, dtype=jnp.float32)
    scale = size / out_size
    centers = start + (i + 0.5) * scale - 0.5  # (out,)
    stretch = jnp.maximum(scale, 1.0)  # antialias when downsampling

    j = jnp.arange(-pad, in_size + pad, dtype=jnp.float32)  # (in + 2 pad,)
    d = (j[None, :] - centers[:, None]) / stretch
    w = kernel(d)
    # zero outside the crop window (window may extend into the pad region)
    in_window = (j[None, :] >= start - 0.5) & (j[None, :] < start + size - 0.5)
    w = jnp.where(in_window, w, 0.0)
    # normalize per output row over valid support (edge handling)
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-8)
    if pad:
        w = w[:, pad : pad + in_size]  # virtual pad pixels contribute zero
    return w.astype(dtype)


@functools.partial(jax.jit, static_argnames=("out_size", "method", "pad_h", "pad_w"))
def crop_resize(
    image,
    y0,
    x0,
    h_size,
    w_size,
    out_size: int,
    method: Method = "cubic",
    pad_h: int = 0,
    pad_w: int = 0,
):
    """Crop window [y0:y0+h_size, x0:x0+w_size] of an HWC image and resize to
    (out_size, out_size, C) — as two matmuls.  All geometry may be traced."""
    h, w = image.shape[0], image.shape[1]
    wy = axis_resize_weights(out_size, h, y0, h_size, method, pad_h)
    wx = axis_resize_weights(out_size, w, x0, w_size, method, pad_w)
    # (out,h)@(h,w,c) -> (out,w,c); then contract w with (out,w)
    tmp = jnp.einsum("oh,hwc->owc", wy, image, preferred_element_type=jnp.float32)
    out = jnp.einsum("pw,owc->opc", wx, tmp, preferred_element_type=jnp.float32)
    return out.astype(image.dtype)


def resize_image(image, out_size: int, method: Method = "cubic"):
    """Plain whole-image square resize (HWC -> out_size x out_size x C)."""
    h, w = image.shape[0], image.shape[1]
    return crop_resize(
        image,
        jnp.float32(0),
        jnp.float32(0),
        jnp.float32(h),
        jnp.float32(w),
        out_size,
        method,
    )


def resize_center_crop(image, out_size: int, method: Method = "cubic"):
    """Resize-shorter-side-then-center-crop — the reference's CLIP analysis
    preprocess `T.Resize(224) + T.CenterCrop(224)` (reference
    functional.py:19-26).  Center-cropping a uniformly resized image equals
    resampling the centered short-side square window of the original, so
    this is one crop_resize call (antialiased, no intermediate image)."""
    h, w = image.shape[0], image.shape[1]
    s = min(h, w)
    return crop_resize(
        image,
        jnp.float32((h - s) / 2.0),
        jnp.float32((w - s) / 2.0),
        jnp.float32(s),
        jnp.float32(s),
        out_size,
        method,
    )


def pad_to_square_resize(image, out_size: int, method: Method = "cubic"):
    """Zero-pad an HWC image to a centered square of its longer side, then
    resize to (out_size, out_size, C) — the reference's overview-cut
    transform (reference cutouts.py:54-64) — without materializing the
    padded image: padding is folded into the resample weights."""
    h, w = image.shape[0], image.shape[1]
    long_side = max(h, w)
    pad_y = (long_side - h) // 2
    pad_x = (long_side - w) // 2
    wy = axis_resize_weights(
        out_size, h, jnp.float32(-pad_y), jnp.float32(long_side), method, pad=pad_y or 0
    )
    wx = axis_resize_weights(
        out_size, w, jnp.float32(-pad_x), jnp.float32(long_side), method, pad=pad_x or 0
    )
    tmp = jnp.einsum("oh,hwc->owc", wy, image, preferred_element_type=jnp.float32)
    out = jnp.einsum("pw,owc->opc", wx, tmp, preferred_element_type=jnp.float32)
    return out.astype(image.dtype)
