"""Tiny randomly-initialized model stack for tests, CI, and multi-chip
dry-runs — same topology knobs as the flagship configuration (SURVEY.md §4
"golden/parity: tiny-UNet fixture"), sized to run in seconds on CPU."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from clip_diffusion_tpu.config import Config, CutoutSchedules, create_schedule
from clip_diffusion_tpu.diffusion.sampling import SamplerConfig
from clip_diffusion_tpu.diffusion.schedule import make_schedule
from clip_diffusion_tpu.models.clip import CLIPModel, tiny_clip_config, tokenize
from clip_diffusion_tpu.models.unet import UNetConfig, UNetModel
from clip_diffusion_tpu.pipeline.guided import (
    GuidedPipeline,
    Perceptor,
    guided_sample,
)


def tiny_config(**overrides) -> Config:
    base = dict(
        width=64,
        height=64,
        num_cutout_batches=1,
        guidance_dtype="float32",  # bitwise placement-invariance in tests
        clip_guidance_scale=1000.0,
        denoise_scale=100.0,
        range_scale=10.0,
        LPIPS_scale=0.0,
        MS_SSIM_scale=0.0,
        cutout_schedules=CutoutSchedules(
            num_overview_cuts=create_schedule((2,), (1000,)),
            num_inner_cuts=create_schedule((2,), (1000,)),
            inner_cut_size_power=create_schedule((5,), (1000,)),
            cut_gray_portion=create_schedule((0.5,), (1000,)),
        ),
    )
    base.update(overrides)
    return Config(**base)


def build_tiny_pipeline(steps: int = 5, mode: str = "ddim",
                        num_perceptors: int = 1,
                        prompt_texts=None):
    """Returns (pipe, sample_fn) where sample_fn(pipe, key, batch) -> final
    images — the canonical single entry used by sharding tests and
    dryrun_multichip.

    `prompt_texts`: list of per-image prompt strings -> heterogeneous-prompt
    mode: text_embeddings get a leading prompt axis (B, 1, D) as in
    zoo.build_pipeline's batched form (pod serving)."""
    cfg = tiny_config()
    ucfg = UNetConfig.tiny(64)
    unet = UNetModel(ucfg)
    uparams = unet.init(
        jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)), jnp.zeros((1,))
    )
    uparams = jax.tree_util.tree_map(
        lambda p: p
        + 0.02 * jax.random.normal(jax.random.PRNGKey(42), p.shape, p.dtype),
        uparams,
    )

    perceptors = []
    perceptor_params = []
    for i in range(num_perceptors):
        ccfg = tiny_clip_config(name=f"tiny{i}")
        clip = CLIPModel(ccfg)
        texts = list(prompt_texts) if prompt_texts else ["a test prompt"]
        toks = jnp.asarray(tokenize(texts))
        cparams = clip.init(
            jax.random.PRNGKey(i + 1), jnp.ones((1, 32, 32, 3)), toks[:1]
        )
        text_emb = clip.apply(cparams, toks, method=CLIPModel.encode_text)
        if prompt_texts:  # heterogeneous: (B, P=1, D) + per-image weights
            text_emb = text_emb[:, None, :]
            text_w = jnp.ones((len(texts), 1))
        else:
            text_w = jnp.ones((1,))
        perceptors.append(
            Perceptor(
                name=ccfg.name,
                embed_image=lambda p, im, c=clip: c.apply(
                    p, im, method=CLIPModel.encode_image
                ),
                input_resolution=32,
            )
        )
        perceptor_params.append(
            {
                "clip": cparams,
                "aesthetic": (),
                "text_embeddings": text_emb,
                "text_weights": text_w,
            }
        )

    pipe = GuidedPipeline(
        unet_apply=lambda p, x, t: unet.apply(p, x, t),
        perceptors=tuple(perceptors),
        config=cfg,
        sampler=SamplerConfig(mode=mode, steps=steps, eta=0.8),
        schedule=make_schedule(steps=steps),
    )
    params = {"unet": uparams, "perceptors": perceptor_params}

    def sample_fn(p, prms, key, batch_size):
        final, _ = guided_sample(p, prms, key, batch_size=batch_size)
        return final

    return pipe, params, sample_fn


def build_flagship_dryrun_pipeline(canvas: int = 64, n_prompts: int = 8,
                                   steps: int = 250,
                                   model_channels: int | None = None):
    """REAL flagship UNet program + heterogeneous prompts, dryrun-sized.

    The UNet is the `UNetConfig.for_image_size(512)` topology (reference
    models.py:95-116) — full 7-level channel_mult, 3 attention resolutions,
    learned-sigma head, resblock up/down — only the canvas shrinks (the
    network is fully convolutional; 64^2 is the smallest canvas its 7-level
    channel_mult supports).  `model_channels` optionally narrows the width
    (256 -> e.g. 64) with the op graph — and therefore every sharding and
    collective XLA inserts — unchanged; dryrun_multichip uses that so the
    cold XLA:CPU compile of this leg fits the driver's wall-clock budget
    (the full-width 552M program takes ~9 min to compile cold on a 1-core
    host — MULTICHIP_r03's rc-124 root cause).  Perceptors stay tiny so the
    dryrun exercises the FLAGSHIP program structure (UNet fwd + VJP,
    het-prompt (B,P,D) spherical loss, cutouts, thresholding, conditioned
    DDIM) without hours of virtual-device CLIP compute.  float32
    params/compute: the virtual-device dryrun backend is CPU (bf16 would be
    emulated)."""
    import dataclasses as dc

    from clip_diffusion_tpu.zoo import _host_init

    cfg = tiny_config(width=canvas, height=canvas)
    # remat off: the rematerialized VJP subgraphs triple XLA CPU's compile
    # time on the virtual-device backend, and a 64^2 batch-32 dryrun has no
    # memory pressure to justify them
    ucfg = dc.replace(
        UNetConfig.for_image_size(512), dtype=jnp.float32, remat=False
    )
    if model_channels is not None:
        ucfg = dc.replace(ucfg, model_channels=model_channels)
    unet = UNetModel(ucfg)
    uparams = _host_init(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, canvas, canvas, 3)),
            jnp.zeros((1,)),
        ),
        param_dtype=jnp.float32,
    )

    ccfg = tiny_clip_config(name="tiny-flagship")
    clip = CLIPModel(ccfg)
    texts = [f"flagship dryrun prompt {i}" for i in range(n_prompts)]
    toks = jnp.asarray(tokenize(texts))
    cparams = clip.init(
        jax.random.PRNGKey(1), jnp.ones((1, 32, 32, 3)), toks[:1]
    )
    text_emb = clip.apply(cparams, toks, method=CLIPModel.encode_text)
    perceptor = Perceptor(
        name=ccfg.name,
        embed_image=lambda p, im, c=clip: c.apply(
            p, im, method=CLIPModel.encode_image
        ),
        input_resolution=32,
    )
    pipe = GuidedPipeline(
        unet_apply=lambda p, x, t: unet.apply(p, x, t),
        perceptors=(perceptor,),
        config=cfg,
        sampler=SamplerConfig(mode="ddim", steps=steps, eta=0.8),
        schedule=make_schedule(steps=steps),
    )
    params = {
        "unet": uparams,
        "perceptors": [
            {
                "clip": cparams,
                "aesthetic": (),
                # heterogeneous prompts: (n_prompts, P=1, D) + weights
                "text_embeddings": text_emb[:, None, :],
                "text_weights": jnp.ones((n_prompts, 1)),
            }
        ],
    }
    return pipe, params
