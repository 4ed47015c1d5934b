"""Pure-functional diffusion sampling math (DDIM + PLMS) for TPU.

Each function is a shape-static `(arrays, step_index) -> arrays` map intended
to live inside one `lax.scan` body; the respaced schedule rides along as a
pytree of device tables gathered by step index (data, not control flow).

Semantics reproduced (re-derived, not translated) from the guided-diffusion
stack the reference drives (SURVEY.md §2.2; call sites reference
sample.py:241-275):

* learn_sigma variance interpolation and pred_xstart algebra of
  `p_mean_variance`,
* classifier-style score conditioning for DDIM (`condition_score`):
  eps <- eps - sqrt(1-alpha_bar_t) * grad,
* the DDIM update with `eta` blending toward DDPM,
* the crowsonkb-fork extensions: `skip_timesteps` + `init_image` (start the
  trajectory from a noised init image) and a PLMS (pseudo linear multistep,
  PNDM) loop with an `order` parameter,
* Imagen-style dynamic thresholding used as `denoised_fn` (reference
  sample.py:116-132).

Layout note: images are NHWC (TPU-native), values in [-1, 1].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.diffusion.schedule import NoiseSchedule

# Maximum PLMS multistep order supported (matches PNDM paper's table).
MAX_PLMS_ORDER = 4


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler knobs (hashable -> safe as jit static argument)."""

    mode: str = "ddim"  # "ddim" | "plms"
    steps: int = 200
    eta: float = 0.8  # DDIM<->DDPM blend (reference sample.py:87)
    skip_timesteps: int = 0
    order: int = 2  # PLMS multistep order (reference sample.py:274)
    dynamic_thresholding_percentile: float = 0.995
    # "histogram": O(n) approximate quantile (ops/quantile.py, error <1e-3);
    # "sort": exact jnp.quantile (the reference's torch.quantile semantics)
    thresholding_method: str = "histogram"
    # compile one exact-sized program per cutout-schedule phase instead of
    # one padded program (trades ~4x compile time for zero wasted CLIP
    # evaluations on inactive cutout slots)
    phase_segmented: bool = False


def schedule_tables(sched: NoiseSchedule, dtype=jnp.float32) -> Dict[str, Any]:
    """NoiseSchedule -> pytree of device arrays for in-scan gathering."""
    return {
        k: jnp.asarray(v) for k, v in schedule_tables_np(sched, dtype).items()
    }


def schedule_tables_np(sched: NoiseSchedule, dtype=jnp.float32) -> Dict[str, Any]:
    """NoiseSchedule -> numpy tables.  Use this form for values closed over
    by functions that are CACHED across jit traces (lru-cached runners,
    step builders): numpy closures are trace-safe, whereas jnp constants
    created under one outer trace leak as stale tracers into the next."""
    tables = {}
    for f in dataclasses.fields(sched):
        v = getattr(sched, f.name)
        if isinstance(v, np.ndarray):
            if v.dtype.kind == "f":
                tables[f.name] = v.astype(np.dtype(dtype))
            else:
                tables[f.name] = v
    return tables


def _bcast(scalar, x):
    """Broadcast a gathered per-step scalar over an NHWC batch."""
    return scalar.reshape((1,) * x.ndim).astype(x.dtype)


# --------------------------------------------------------------------------
# p_mean_variance algebra
# --------------------------------------------------------------------------

def predict_xstart_from_eps(x, eps, tables, step):
    c1 = _bcast(tables["sqrt_recip_alphas_cumprod"][step], x)
    c2 = _bcast(tables["sqrt_recipm1_alphas_cumprod"][step], x)
    return c1 * x - c2 * eps


def predict_eps_from_xstart(x, pred_xstart, tables, step):
    c1 = _bcast(tables["sqrt_recip_alphas_cumprod"][step], x)
    c2 = _bcast(tables["sqrt_recipm1_alphas_cumprod"][step], x)
    return (c1 * x - pred_xstart) / c2


def learned_log_variance(var_raw, tables, step):
    """learn_sigma head: interpolate between posterior (min) and beta (max)
    log-variance with the model's [-1,1] output."""
    min_log = _bcast(tables["posterior_log_variance_clipped"][step], var_raw)
    max_log = _bcast(jnp.log(tables["betas"][step]), var_raw)
    frac = (var_raw + 1.0) / 2.0
    return frac * max_log + (1.0 - frac) * min_log


def dynamic_threshold(x_start, percentile: float):
    """Imagen dynamic thresholding (reference sample.py:116-132): clamp each
    batch element to its abs-value `percentile` quantile (floored at 1) and
    rescale into [-1, 1]."""
    b = x_start.shape[0]
    flat = jnp.abs(x_start.reshape(b, -1)).astype(jnp.float32)
    thresh = jnp.quantile(flat, percentile, axis=-1)
    thresh = jnp.maximum(thresh, 1.0)
    thresh = thresh.reshape((b,) + (1,) * (x_start.ndim - 1)).astype(x_start.dtype)
    return jnp.clip(x_start, -thresh, thresh) / thresh


# --------------------------------------------------------------------------
# Conditioning
# --------------------------------------------------------------------------

def condition_eps(eps, grad, tables, step):
    """Score conditioning: shift eps by the (negated-loss) guidance gradient,
    scaled by sqrt(1 - alpha_bar_t) — guided-diffusion `condition_score`."""
    return eps - _bcast(tables["sqrt_one_minus_alphas_cumprod"][step], eps) * grad


# --------------------------------------------------------------------------
# Forward process
# --------------------------------------------------------------------------

def q_sample(x_start, tables, step, noise):
    """Diffuse a clean image to respaced step `step` (used to start a
    trajectory from an init image with skip_timesteps; crowsonkb-fork
    semantics at reference sample.py:257-258)."""
    c1 = _bcast(tables["sqrt_alphas_cumprod"][step], x_start)
    c2 = _bcast(tables["sqrt_one_minus_alphas_cumprod"][step], x_start)
    return c1 * x_start + c2 * noise


# --------------------------------------------------------------------------
# DDIM
# --------------------------------------------------------------------------

def ddim_step(x, eps, pred_xstart, tables, step, eta, noise):
    """One DDIM update x_t -> x_{t-1} at respaced index `step`.

    eta=0 is deterministic DDIM; eta=1 matches DDPM posterior noise scale.
    Noise is suppressed at the final step (step == 0)."""
    acp = _bcast(tables["alphas_cumprod"][step], x)
    acp_prev = _bcast(tables["alphas_cumprod_prev"][step], x)
    sigma = (
        eta
        * jnp.sqrt((1.0 - acp_prev) / (1.0 - acp))
        * jnp.sqrt(1.0 - acp / acp_prev)
    )
    mean = (
        pred_xstart * jnp.sqrt(acp_prev)
        + jnp.sqrt(jnp.maximum(1.0 - acp_prev - sigma**2, 0.0)) * eps
    )
    nonzero = (step > 0).astype(x.dtype)
    return mean + nonzero * sigma * noise


# --------------------------------------------------------------------------
# PLMS (PNDM pseudo linear multistep)
# --------------------------------------------------------------------------

# Adams-Bashforth coefficient rows, padded to 4 taps; row k uses k+1 history
# entries (current eps first).
_PLMS_COEFS = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [3.0 / 2.0, -1.0 / 2.0, 0.0, 0.0],
        [23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0, 0.0],
        [55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0],
    ],
    dtype=np.float32,
)


def plms_eps(eps, eps_history, history_count, order: int):
    """Combine current eps with history into the multistep eps'.

    eps_history: (MAX_PLMS_ORDER-1, *eps.shape), newest first.
    history_count: traced int32 — how many entries are valid.
    order: static int in [1, 4]."""
    k = jnp.minimum(history_count, order - 1)  # effective multistep index
    coefs = jnp.asarray(_PLMS_COEFS)[k]  # (4,)
    stacked = jnp.concatenate([eps[None], eps_history], axis=0)  # (4, ...)
    coefs = coefs.reshape((MAX_PLMS_ORDER,) + (1,) * eps.ndim).astype(eps.dtype)
    return jnp.sum(coefs * stacked, axis=0)


def push_history(eps, eps_history):
    """Shift the newest eps into the history ring (newest first)."""
    return jnp.concatenate([eps[None], eps_history[:-1]], axis=0)


def plms_step(x, eps_prime, tables, step):
    """Deterministic DDIM-form transfer with the multistep eps'."""
    acp_prev = _bcast(tables["alphas_cumprod_prev"][step], x)
    pred_xstart = predict_xstart_from_eps(x, eps_prime, tables, step)
    return pred_xstart * jnp.sqrt(acp_prev) + jnp.sqrt(1.0 - acp_prev) * eps_prime


def init_history(shape, dtype=jnp.float32):
    return jnp.zeros((MAX_PLMS_ORDER - 1,) + tuple(shape), dtype=dtype)
