"""Fast abs-quantile for dynamic thresholding.

`jnp.quantile` sorts the full image per step (SURVEY.md §7 flags this as a
hot-loop cost: a 512x512x3 sort every timestep).  Dynamic thresholding only
needs the |x| quantile to ~1e-3 absolute accuracy (it's floored at 1.0 and
used as a clamp), so a two-pass histogram gives an O(n) VPU-friendly
replacement:

  pass 1: per-image max|x| (one reduction)
  pass 2: 4096-bin histogram of |x| (one-hot-free: scaled floor + bincount
          as a segment-sum), cumulative sum, interpolate the q-th edge.

Error bound: max|x| / bins (~0.001 for x in [-4, 4]).  A Pallas kernel
(`histogram_quantile_pallas`) streams blocks through VMEM with the
histogram living in scratch — used on TPU when the tensor is large; the
XLA version is the portable default and the two are tested against
jnp.quantile.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("bins",))
def histogram_abs_quantile(x, q, bins: int = 4096):
    """(B, N) values -> (B,) approximate q-quantile of |x| per row.

    Two-level edge counting (sqrt(bins) coarse edges, then sqrt(bins) fine
    edges inside the selected coarse bin): every pass is a broadcast
    compare + reduction — no scatter.  The scatter-based
    bincount/segment_sum formulation serializes on TPU the same way image
    gathers do (~10 ms/step for a 512^2 image vs ~1 ms for this form).
    `lvl = ceil(sqrt(bins))` so the effective resolution lvl^2 >= bins and
    the error bound max|x| / lvl^2 <= max|x| / bins holds for every `bins`,
    square or not."""
    lvl = max(int(math.ceil(math.sqrt(bins))), 2)
    ax = jnp.abs(x.astype(jnp.float32))
    n = x.shape[1]
    target = q * n
    hi = jnp.max(ax, axis=1, keepdims=True)  # (B,1)
    scale = jnp.maximum(hi, 1e-12)

    # coarse: counts of ax <= scale * k/lvl for k = 1..lvl
    steps = jnp.arange(1, lvl + 1, dtype=jnp.float32) / lvl  # (lvl,)
    cnt1 = jnp.sum(
        ax[:, :, None] <= scale[:, :, None] * steps[None, None, :], axis=1
    )  # (B, lvl)
    c_idx = jnp.argmax(cnt1 >= target, axis=1)  # (B,)
    lo = c_idx.astype(jnp.float32)[:, None] / lvl * scale  # (B,1) bin lower
    below_lo = jnp.where(
        c_idx > 0,
        jnp.take_along_axis(cnt1, jnp.maximum(c_idx - 1, 0)[:, None], 1)[:, 0],
        0.0,
    )  # (B,)

    # fine: counts inside [lo, lo + scale/lvl]
    width = scale / lvl  # (B,1)
    edges2 = lo + width * steps[None, :]  # (B, lvl)
    cnt2 = jnp.sum(ax[:, :, None] <= edges2[:, None, :], axis=1)  # (B, lvl)
    f_idx = jnp.argmax(cnt2 >= target, axis=1)  # (B,)
    cdf_prev = jnp.where(
        f_idx > 0,
        jnp.take_along_axis(cnt2, jnp.maximum(f_idx - 1, 0)[:, None], 1)[:, 0],
        below_lo,
    )
    count = jnp.take_along_axis(cnt2, f_idx[:, None], 1)[:, 0] - cdf_prev
    frac = jnp.clip((target - cdf_prev) / jnp.maximum(count, 1.0), 0.0, 1.0)
    return (
        lo[:, 0]
        + (f_idx.astype(jnp.float32) + frac) * (width[:, 0] / lvl)
    )


def histogram_quantile_pallas(x, q, bins: int = 2048, block: int = 8192):
    """Pallas TPU kernel: same math, histogram accumulated in VMEM scratch
    while blocks of the row stream through.  x: (B, N) with N % block == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = x.shape
    assert n % block == 0, (n, block)
    n_blocks = n // block

    def kernel(x_ref, hi_ref, out_ref, hist_ref):
        hi = jnp.maximum(hi_ref[0, 0], 1e-12)
        hist_ref[:] = jnp.zeros_like(hist_ref)

        def body(i, _):
            seg = jnp.abs(x_ref[pl.ds(i * block, block)].astype(jnp.float32))
            idx = jnp.clip((seg / hi * bins).astype(jnp.int32), 0, bins - 1)
            # bincount via one-hot accumulation over a (block,) segment:
            # bins x block comparison matrix reduced over block — VPU-sized
            bin_ids = jax.lax.broadcasted_iota(jnp.int32, (bins, block), 0)
            onehot = (bin_ids == idx[None, :]).astype(jnp.float32)
            hist_ref[:] = hist_ref[:] + jnp.sum(onehot, axis=1, keepdims=True)
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)
        cdf = jnp.cumsum(hist_ref[:, 0])
        target = q * n
        bin_idx = jnp.argmax(cdf >= target)
        cdf_prev = jnp.where(bin_idx > 0, cdf[jnp.maximum(bin_idx - 1, 0)], 0.0)
        count = hist_ref[bin_idx, 0]
        frac = jnp.clip((target - cdf_prev) / jnp.maximum(count, 1.0), 0.0, 1.0)
        out_ref[0, 0] = (bin_idx.astype(jnp.float32) + frac) / bins * hi

    hi = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1)  # (B,)

    def one_row(row, row_hi):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((bins, 1), jnp.float32)],
        )(row, row_hi.reshape(1, 1))[0, 0]

    return jax.vmap(one_row)(x, hi)


def dynamic_threshold_fast(x_start, percentile: float, bins: int = 4096):
    """Histogram-quantile dynamic thresholding (drop-in for
    diffusion.sampling.dynamic_threshold)."""
    b = x_start.shape[0]
    flat = x_start.reshape(b, -1)
    thresh = histogram_abs_quantile(flat, percentile, bins)
    thresh = jnp.maximum(thresh, 1.0)
    thresh = thresh.reshape((b,) + (1,) * (x_start.ndim - 1)).astype(
        x_start.dtype
    )
    return jnp.clip(x_start, -thresh, thresh) / thresh
