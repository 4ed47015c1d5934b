"""Latent-diffusion text-to-image pipeline with classifier-free guidance.

The reference's second pipeline (reference sample.py:317-460): LDM
txt2img-f8-large sampled with DDIM/PLMS under CFG, optional init-image
(img2img) and mask (inpainting), decoded by the VQ-f8 first stage, then
Real-ESRGAN x4 upscaling.

TPU design:
* the whole S-step CFG loop is one `lax.scan`; cond and uncond UNet
  evaluations are fused into a single forward at batch 2B (one MXU-saturated
  call instead of two half-empty ones — the reference runs them via a
  concatenated batch inside CompVis code too, but eagerly);
* LDM's own beta schedule (sqrt-linspace squared, linear_start 8.5e-4,
  linear_end 1.2e-2) and its DDIM table conventions (alpha_prev[0] =
  alphas_cumprod[0], "uniform" timestep subsampling t = i*(1000//S) + 1)
  are reproduced exactly so converted checkpoints sample identically;
* inpainting keeps the reference semantics: at every step the known region
  is re-noised from the init latent and pasted by the mask (mask=1 keeps
  the original; reference passes x0+mask through sampler.sample,
  sample.py:410-421).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.diffusion.sampling import (
    init_history,
    plms_eps,
    push_history,
)

LDM_NUM_TIMESTEPS = 1000
LDM_LINEAR_START = 0.00085
LDM_LINEAR_END = 0.012


def ldm_alphas_cumprod() -> np.ndarray:
    betas = (
        np.linspace(
            np.sqrt(LDM_LINEAR_START),
            np.sqrt(LDM_LINEAR_END),
            LDM_NUM_TIMESTEPS,
            dtype=np.float64,
        )
        ** 2
    )
    return np.cumprod(1.0 - betas)


def ldm_ddim_tables(steps: int, eta: float):
    """CompVis DDIMSampler table conventions for S uniform steps."""
    c = LDM_NUM_TIMESTEPS // steps
    timesteps = np.arange(steps) * c + 1  # "uniform" discretization
    acp = ldm_alphas_cumprod()
    alphas = acp[timesteps]
    alphas_prev = np.concatenate([[acp[0]], alphas[:-1]])
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return {
        "timesteps": jnp.asarray(timesteps, jnp.int32),
        "alphas": jnp.asarray(alphas, jnp.float32),
        "alphas_prev": jnp.asarray(alphas_prev, jnp.float32),
        "sqrt_one_minus_alphas": jnp.asarray(np.sqrt(1 - alphas), jnp.float32),
        "sigmas": jnp.asarray(sigmas, jnp.float32),
    }


@dataclasses.dataclass(frozen=True)
class LatentPipeline:
    """Pure functions + static metadata (parameters travel through jit as
    the `params` argument of latent_sample — closures would embed them as
    HLO constants, see pipeline/guided.py docstring):

    unet_apply(unet_params, x, t, context) -> eps
    decode(vq_params, z) -> pixels [-1,1]; encode(vq_params, img) -> latents
    """

    unet_apply: Callable
    decode: Optional[Callable] = None
    encode: Optional[Callable] = None
    latent_channels: int = 4
    downsample: int = 8  # f8


def latent_sample(
    pipe: LatentPipeline,
    params,
    key,
    context_cond,
    context_uncond=None,
    batch_size: int = 1,
    height: int = 256,
    width: int = 256,
    steps: int = 50,
    guidance_scale: float = 5.0,
    eta: float = 0.0,
    mode: str = "ddim",
    order: int = 2,
    x0_latent=None,
    mask=None,
    max_steps_per_dispatch: Optional[int] = None,
    chunk_times: Optional[list] = None,
):
    """Run the CFG latent diffusion loop; returns final latents (B,h,w,4).

    context_cond/uncond: (B, 77, D) text conditioning.  guidance_scale <= 0
    or context_uncond=None disables CFG (single forward per step, matching
    reference sample.py:396-401).

    `max_steps_per_dispatch`: when set, the trajectory executes as
    host-chained scan chunks of at most this many steps (one compiled
    program reused for every same-sized chunk; the PLMS history carry
    crosses chunks bit-exactly).  `chunk_times`, if a list, receives
    `(n_steps, seconds)` per chunk with a forced on-device completion —
    the same steady-state measurement hook as `guided_sample`
    (relay dispatch latency is noisy; min-over-chunks filters it)."""
    if mode == "plms":
        eta = 0.0  # reference sample.py:366-367
    tables = ldm_ddim_tables(steps, eta)
    h = height // pipe.downsample
    w = width // pipe.downsample
    shape = (batch_size, h, w, pipe.latent_channels)

    use_cfg = context_uncond is not None and guidance_scale > 0

    def model_eps(all_params, ctx_c, ctx_u, x, t_val):
        unet_params = (
            all_params["unet"]
            if isinstance(all_params, dict) and "unet" in all_params
            else all_params
        )
        b = x.shape[0]
        t = jnp.full((b,), t_val, jnp.float32)
        if use_cfg:
            # The fused 2B batch is INTERLEAVED per image (img0-uncond,
            # img0-cond, img1-uncond, ...), not stacked in halves: under
            # the pod's batch sharding, half-stacking puts an image's two
            # passes on different devices and GSPMD reshuffles the
            # doubled batch with collective-permutes + an all-gather
            # EVERY step (measured on the 8-device mesh); interleaving
            # keeps both rows of each image inside its own shard, so the
            # CFG scan carries zero collectives.  Same values either way
            # (the UNet is batch-elementwise).
            def _interleave(a, b_):
                return jnp.stack([a, b_], axis=1).reshape(
                    (2 * a.shape[0],) + a.shape[1:]
                )

            x2 = _interleave(x, x)
            t2 = _interleave(t, t)
            ctx = _interleave(ctx_u, ctx_c)
            eps2 = pipe.unet_apply(unet_params, x2, t2, ctx)
            eps2 = eps2.reshape((b, 2) + eps2.shape[1:])
            eps_uc, eps_c = eps2[:, 0], eps2[:, 1]
            return eps_uc + guidance_scale * (eps_c - eps_uc)
        return pipe.unet_apply(unet_params, x, t, ctx_c)

    if x0_latent is not None:
        x0_latent = jnp.asarray(x0_latent, jnp.float32)
    if mask is not None:
        mask = jnp.asarray(mask, jnp.float32)

    k_init, k_scan = jax.random.split(key)
    x0_init = jax.random.normal(k_init, shape, jnp.float32)
    inpaint = mask is not None and x0_latent is not None

    def run(params, ctx_c, ctx_u, x, x0_lat, msk, idxs, hist, cnt):
        def body(carry, i):
            x, hist, cnt = carry
            step_key = jax.random.fold_in(k_scan, i)
            a = tables["alphas"][i]
            a_prev = tables["alphas_prev"][i]
            sqrt_1ma = tables["sqrt_one_minus_alphas"][i]
            sigma = tables["sigmas"][i]
            t_val = tables["timesteps"][i].astype(jnp.float32)

            if inpaint:
                # re-noise the known region to the current step and paste
                noise = jax.random.normal(
                    jax.random.fold_in(step_key, 1), x.shape, x.dtype
                )
                x_orig = jnp.sqrt(a) * x0_lat + sqrt_1ma * noise
                x = x_orig * msk + (1.0 - msk) * x

            eps = model_eps(params, ctx_c, ctx_u, x, t_val)
            if mode == "plms":
                eps_use = plms_eps(eps, hist, cnt, order)
                hist = push_history(eps, hist)
                cnt = cnt + 1
            else:
                eps_use = eps
            pred_x0 = (x - sqrt_1ma * eps_use) / jnp.sqrt(a)
            dir_xt = jnp.sqrt(
                jnp.maximum(1.0 - a_prev - sigma**2, 0.0)
            ) * eps_use
            noise = sigma * jax.random.normal(step_key, x.shape, x.dtype)
            x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
            return (x_prev, hist, cnt), None

        (x, hist, cnt), _ = jax.lax.scan(body, (x, hist, cnt), idxs)
        # the scalar is computed inside the program so a host readback of
        # it forces the whole chunk to complete (block_until_ready does not
        # truly sync on remote-attached backends)
        return x, hist, cnt, jnp.float32(jnp.sum(x))

    zeros = jnp.zeros(shape, jnp.float32)
    run_jit = jax.jit(run)
    common = (
        params,
        context_cond,
        context_uncond if use_cfg else jnp.zeros_like(context_cond),
    )
    tail = (
        x0_latent if inpaint else zeros,
        mask if inpaint else zeros[..., :1],
    )
    steps_desc = np.arange(steps - 1, -1, -1, dtype=np.int32)
    x, hist, cnt = x0_init, init_history(shape), jnp.int32(0)
    if max_steps_per_dispatch is None or max_steps_per_dispatch >= steps:
        x, _, _, _ = run_jit(*common, x, *tail, jnp.asarray(steps_desc),
                             hist, cnt)
        return x
    for lo in range(0, steps, max_steps_per_dispatch):
        idxs = steps_desc[lo:lo + max_steps_per_dispatch]
        t0 = time.perf_counter() if chunk_times is not None else None
        x, hist, cnt, checksum = run_jit(
            *common, x, *tail, jnp.asarray(idxs), hist, cnt
        )
        if chunk_times is not None:
            float(checksum)
            chunk_times.append((len(idxs), time.perf_counter() - t0))
    return x


def img2img_start(pipe: LatentPipeline, params, image):
    """Encode an init image into latents (reference sample.py:383-388)."""
    if pipe.encode is None:
        raise ValueError("pipeline has no first-stage encoder")
    return pipe.encode(params, image)


@jax.jit
def _denormalize(x):
    # jitted module-level so the eager path costs ONE extra dispatch, not
    # three (each eager op is a full round-trip on remote-attached backends)
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def decode_latents(pipe: LatentPipeline, params, latents):
    """Latents -> [0,1] pixels (reference decodes then denormalizes,
    sample.py:422-423)."""
    if pipe.decode is None:
        raise ValueError("pipeline has no first-stage decoder")
    return _denormalize(pipe.decode(params, latents))
