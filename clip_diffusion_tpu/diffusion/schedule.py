"""Noise schedules and timestep respacing.

Semantics match the OpenAI/crowsonkb guided-diffusion stack the reference
builds on (see SURVEY.md §2.2): a linear beta schedule over a base of
`diffusion_steps` timesteps, respaced to `steps` sampler steps via the
`"ddim{N}"` rule, with `rescale_timesteps=True` mapping model-time into
[0, 1000).  The reference constructs this through
`create_model_and_diffusion` with `diffusion_steps=(1000//steps)*steps` and
`timestep_respacing=f"ddim{steps}"` (reference models.py:95-116).

Everything here is precomputed host-side into dense fp32/f64 tables; the
sampler gathers rows by respaced index inside the compiled loop.
"""

from __future__ import annotations

import dataclasses
from typing import Set

import numpy as np


def linear_betas(num_timesteps: int) -> np.ndarray:
    """Linear beta schedule, scaled so any base length matches the 1000-step
    reference process (guided-diffusion `get_named_beta_schedule` semantics;
    reference selects "linear" at models.py:107)."""
    scale = 1000.0 / num_timesteps
    return np.linspace(
        scale * 0.0001, scale * 0.02, num_timesteps, dtype=np.float64
    )


def space_timesteps(num_timesteps: int, desired_count: int) -> Set[int]:
    """`"ddim{N}"` respacing rule: find a stride such that
    range(0, num_timesteps, stride) has exactly N elements.

    Mirrors guided-diffusion `space_timesteps` for the ddim-prefixed spec the
    reference always uses (reference models.py:104)."""
    for stride in range(1, num_timesteps):
        if len(range(0, num_timesteps, stride)) == desired_count:
            return set(range(0, num_timesteps, stride))
    raise ValueError(
        f"cannot create exactly {desired_count} steps with an integer stride"
    )


def base_diffusion_steps(steps: int) -> int:
    """The reference rounds the base process length to a multiple of the
    sampler step count so cutout schedules stay aligned:
    `(1000//steps)*steps if steps < 1000 else steps` (reference
    models.py:100-102)."""
    return (1000 // steps) * steps if steps < 1000 else steps


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Respaced Gaussian-diffusion tables, one row per *sampler* step.

    All arrays have shape (num_steps,).  `timestep_map` holds the original
    base-process timestep of each respaced step; `scaled_timesteps` is what
    the UNet consumes (rescale_timesteps=True -> t * 1000/base;
    reference models.py:103)."""

    num_steps: int
    base_steps: int
    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    alphas_cumprod_next: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    timestep_map: np.ndarray
    scaled_timesteps: np.ndarray

    def astype(self, dtype):
        out = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, np.ndarray) and v.dtype.kind == "f":
                v = v.astype(dtype)
            out[f.name] = v
        return NoiseSchedule(**out)


def make_schedule(steps: int, base_steps: int | None = None) -> NoiseSchedule:
    """Build the respaced schedule for `steps` sampler steps.

    Equivalent to guided-diffusion's SpacedDiffusion: compute base-process
    alphas_cumprod, keep the respaced subset, and re-derive betas so the
    kept process has identical marginals."""
    if base_steps is None:
        base_steps = base_diffusion_steps(steps)
    base_betas = linear_betas(base_steps)
    base_alphas_cumprod = np.cumprod(1.0 - base_betas)

    use = sorted(space_timesteps(base_steps, steps))
    timestep_map = np.asarray(use, dtype=np.int32)

    last = 1.0
    new_betas = []
    for t in use:
        a = base_alphas_cumprod[t]
        new_betas.append(1.0 - a / last)
        last = a
    betas = np.asarray(new_betas, dtype=np.float64)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = (
        betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    )
    # log-variance clipped at t=0 because posterior variance is 0 there.
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    posterior_mean_coef1 = (
        betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    )
    posterior_mean_coef2 = (
        (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
    )

    scaled_timesteps = timestep_map.astype(np.float64) * (1000.0 / base_steps)

    return NoiseSchedule(
        num_steps=steps,
        base_steps=base_steps,
        betas=betas,
        alphas_cumprod=alphas_cumprod,
        alphas_cumprod_prev=alphas_cumprod_prev,
        alphas_cumprod_next=alphas_cumprod_next,
        sqrt_alphas_cumprod=np.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - alphas_cumprod),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod - 1.0),
        posterior_variance=posterior_variance,
        posterior_log_variance_clipped=posterior_log_variance_clipped,
        posterior_mean_coef1=posterior_mean_coef1,
        posterior_mean_coef2=posterior_mean_coef2,
        timestep_map=timestep_map,
        scaled_timesteps=scaled_timesteps,
    )
