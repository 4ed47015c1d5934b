"""Disco-style cutout engine, reformulated for XLA's static-shape world.

The reference builds a fresh `Cutouts` module per guidance step and loops
Python-side over a *schedule-dependent* number of cuts with *random-sized*
crops (reference cutouts.py:47-114, driven from sample.py:165-172).  Neither
dynamic trip counts nor dynamic shapes exist under `jit`, so here:

* every step computes a fixed `max_overview + max_inner` cut slots (the
  schedule maxima, 14+12 for the default schedules) and returns a weight
  vector that zeroes the inactive slots and implements the reference's
  mean-over-actual-cuts in one masked dot product;
* random crop geometry (size ~ u**power * (short-min)+min, integer offsets;
  reference cutouts.py:84-92) stays *data*: each slot's crop+antialiased
  resize is two MXU matmuls with weights computed from the traced geometry
  (see ops/resize.py);
* the first `int(gray_portion * num_inner)` inner-cut slots are grayscaled —
  including the reference's `<=` quirk that always grays inner slot 0
  (reference cutouts.py:102-103);
* overview slots use the deterministic identity/gray/hflip/gray-hflip
  variants when the scheduled count is <= 4, else plain copies (reference
  cutouts.py:67-79);
* the torchvision augmentation stack runs vectorized over all slots
  (ops/augment.py).

Input images are NHWC in [-1, 1]; cuts are returned in [0, 1] (the reference
denormalizes before cutting, cutouts.py:133) ready for CLIP normalization.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from clip_diffusion_tpu.ops.augment import (
    AugmentConfig,
    augment_batch,
    rgb_to_grayscale,
)
from clip_diffusion_tpu.ops.resize import crop_resize, pad_to_square_resize


@dataclasses.dataclass(frozen=True)
class CutoutSpec:
    """Static cutout geometry (hashable -> jit static arg)."""

    cut_size: int  # CLIP visual input resolution
    max_overview: int = 14  # schedule maxima; see CutoutSchedules
    max_inner: int = 12
    augment: bool = True
    augment_cfg: AugmentConfig = AugmentConfig()

    @property
    def max_total(self) -> int:
        return self.max_overview + self.max_inner


def _overview_cuts(image01, num_overview, spec: CutoutSpec):
    """(max_overview, S, S, C) deterministic overview slots."""
    base = pad_to_square_resize(image01, spec.cut_size)  # (S,S,C)
    few = num_overview <= 4
    variants = [base, rgb_to_grayscale(base), base[:, ::-1, :],
                rgb_to_grayscale(base[:, ::-1, :])]
    slots = []
    for i in range(spec.max_overview):
        if i < 4:
            slots.append(jnp.where(few, variants[i], base))
        else:
            slots.append(base)
    return jnp.stack(slots, axis=0)


def _inner_cuts(image01, key, num_inner, size_power, gray_portion, spec: CutoutSpec):
    """(max_inner, S, S, C) random crop slots."""
    h, w = image01.shape[0], image01.shape[1]
    shorter = float(min(h, w))
    min_size = float(min(h, w, spec.cut_size))

    def one(i, k):
        ku, ky, kx = jax.random.split(k, 3)
        u = jax.random.uniform(ku, ())
        size = jnp.floor(u**size_power * (shorter - min_size) + min_size)
        # integer offsets in [0, dim - size] (reference randint high is
        # exclusive at dim - size + 1)
        oy = jnp.floor(jax.random.uniform(ky, ()) * (h - size + 1.0))
        ox = jnp.floor(jax.random.uniform(kx, ()) * (w - size + 1.0))
        cut = crop_resize(image01, oy, ox, size, size, spec.cut_size)
        # reference quirk: `i <= int(gray_portion * num_inner)` -> slot 0 is
        # always grayscaled
        grayed = i <= jnp.floor(gray_portion * num_inner.astype(jnp.float32))
        return jnp.where(grayed, rgb_to_grayscale(cut), cut)

    keys = jax.random.split(key, spec.max_inner)
    idx = jnp.arange(spec.max_inner)
    return jax.vmap(one)(idx, keys)


def make_cutouts(
    image,
    key,
    num_overview,
    num_inner,
    size_power,
    gray_portion,
    spec: CutoutSpec,
):
    """Cut one HWC image (in [-1,1]) into `spec.max_total` fixed slots.

    Returns (cuts, weights): cuts (max_total, S, S, C) in [0,1]-ish space
    (augmentation noise may exceed the range, as in the reference), and
    weights (max_total,) summing to 1 over active slots — `weights @ f(cuts)`
    is the reference's mean over the scheduled number of cuts."""
    image01 = (image + 1.0) / 2.0  # denormalize (reference cutouts.py:133)
    k_inner, k_aug = jax.random.split(key)

    parts = []
    if spec.max_overview > 0:
        parts.append(_overview_cuts(image01, num_overview, spec))
    if spec.max_inner > 0:
        parts.append(
            _inner_cuts(image01, k_inner, num_inner, size_power,
                        gray_portion, spec)
        )
    if not parts:
        raise ValueError("CutoutSpec with zero slots")
    cuts = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    if spec.augment:
        cuts = augment_batch(cuts, k_aug, spec.augment_cfg)

    slot = jnp.arange(spec.max_total)
    active = jnp.where(
        slot < spec.max_overview,
        slot < num_overview,
        (slot - spec.max_overview) < num_inner,
    ).astype(jnp.float32)
    total = jnp.maximum(num_overview + num_inner, 1).astype(jnp.float32)
    weights = active / total
    return cuts, weights


def make_cutouts_batch(
    images,
    key,
    num_overview,
    num_inner,
    size_power,
    gray_portion,
    spec: CutoutSpec,
    repeats: int = 1,
):
    """Batched cutouts: (B, H, W, C) -> (B, R*max_total, S, S, C) where R is
    `repeats` — the fused equivalent of the reference's `num_cutout_batches`
    sequential loop (reference sample.py:162; grad averaging at :206,213 is
    an arithmetic mean over iid batches, so R independent slot groups in one
    CLIP forward are mathematically identical and keep the MXU busy).

    Returns (cuts, weights) with weights (B, R*max_total) summing to 1 per
    image (the 1/R batch averaging is folded in)."""
    b = images.shape[0]
    keys = jax.random.split(key, b * repeats).reshape(b, repeats, 2)

    def per_image(img, ks):
        cuts, ws = jax.vmap(
            lambda k: make_cutouts(
                img, k, num_overview, num_inner, size_power, gray_portion, spec
            )
        )(ks)  # (R, max_total, S, S, C), (R, max_total)
        cuts = cuts.reshape((-1,) + cuts.shape[2:])
        ws = ws.reshape(-1) / repeats
        return cuts, ws

    return jax.vmap(per_image)(images, keys)
