import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _tiny_pipeline(mode="ddim", clip_scale=1000.0, steps=10, num_perceptors=1):
    cfg = Config(
        width=64,
        height=64,
        num_cutout_batches=1,
        clip_guidance_scale=clip_scale,
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
        toks = jnp.asarray(tokenize(["a test prompt"]))
        cparams = clip.init(
            jax.random.PRNGKey(i + 1), jnp.ones((1, 32, 32, 3)), toks
        )
        text_emb = clip.apply(cparams, toks, method=CLIPModel.encode_text)
        perceptors.append(
            Perceptor(
                name=ccfg.name,
                embed_image=lambda p, im, c=clip: c.apply(
                    p, im, method=CLIPModel.encode_image
                ),
                input_resolution=32,
            )
        )
        perceptor_params.append({
            "clip": cparams,
            "aesthetic": (),
            "text_embeddings": text_emb,
            "text_weights": jnp.ones((1,)),
        })

    sched = make_schedule(steps=steps)
    pipe = GuidedPipeline(
        unet_apply=lambda p, x, t: unet.apply(p, x, t),
        perceptors=tuple(perceptors),
        config=cfg,
        sampler=SamplerConfig(mode=mode, steps=steps, eta=0.8),
        schedule=sched,
    )
    return pipe, {"unet": uparams, "perceptors": perceptor_params}


def test_guided_sample_end_to_end():
    pipe, params = _tiny_pipeline()
    final, frames = guided_sample(pipe, params, jax.random.PRNGKey(0),
                                  batch_size=2)
    assert final.shape == (2, 64, 64, 3)
    assert frames.shape[0] == 6
    assert np.isfinite(np.asarray(final)).all()
    # dynamic thresholding keeps pred_x0 in [-1, 1]... up to the guidance
    # shift; bound loosely
    assert float(jnp.abs(final).max()) < 3.0


def test_guided_sample_plms():
    pipe, params = _tiny_pipeline(mode="plms")
    final, _ = guided_sample(pipe, params, jax.random.PRNGKey(1),
                             batch_size=1)
    assert np.isfinite(np.asarray(final)).all()


def test_guidance_changes_output():
    """clip_guidance_scale=0 vs >0 must produce different trajectories."""
    key = jax.random.PRNGKey(2)
    p1, prm1 = _tiny_pipeline(clip_scale=0.0)
    p2, prm2 = _tiny_pipeline(clip_scale=5000.0)
    f1, _ = guided_sample(p1, prm1, key)
    f2, _ = guided_sample(p2, prm2, key)
    assert float(jnp.abs(f1 - f2).max()) > 1e-4


def test_batch_elements_independent():
    """Each batch element must evolve under its own RNG (different noise),
    and identical (x0, RNG) pairs must reproduce."""
    pipe, params = _tiny_pipeline(clip_scale=0.0)
    final, _ = guided_sample(pipe, params, jax.random.PRNGKey(3), batch_size=2)
    assert float(jnp.abs(final[0] - final[1]).max()) > 1e-4
    final2, _ = guided_sample(pipe, params, jax.random.PRNGKey(3), batch_size=2)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final2))


def test_init_image_resume():
    """skip_timesteps + init image: trajectory starts near the init."""
    pipe, params = _tiny_pipeline(clip_scale=0.0)
    pipe = GuidedPipeline(
        unet_apply=pipe.unet_apply,
        perceptors=pipe.perceptors,
        config=pipe.config,
        sampler=SamplerConfig(mode="ddim", steps=10, eta=0.0, skip_timesteps=8),
        schedule=pipe.schedule,
    )
    init = jnp.full((1, 64, 64, 3), 0.5)
    final, frames = guided_sample(
        pipe, params, jax.random.PRNGKey(4), batch_size=1, init_image=init
    )
    # only 2 steps from a lightly-noised init -> output stays near init
    assert float(jnp.abs(final - init).mean()) < 0.5
    assert frames.shape[0] <= 6


def test_progress_callback_fires():
    pipe, params = _tiny_pipeline(clip_scale=0.0)
    seen = []

    def cb(pos, imgs):
        seen.append((int(pos), np.asarray(imgs).shape))

    guided_sample(
        pipe, params, jax.random.PRNGKey(5), batch_size=1,
        progress_callback=cb, progress_every=5,
    )
    jax.effects_barrier()
    assert len(seen) == 2  # steps 0 and 5 of 10
    assert seen[0][1] == (1, 64, 64, 3)


def test_lpips_init_loss_changes_output():
    """Reference gate (sample.py:216-226): with an init image present,
    LPIPS_scale 0 -> 1000 must change the trajectory (the round-1 bug was
    LPIPS never being wired into the public pipeline)."""
    import dataclasses

    from clip_diffusion_tpu.zoo import build_lpips

    lpips_model, lpips_params = build_lpips()
    lpips_fn = lambda p, x, y: lpips_model.apply(p, x, y)
    init = jnp.full((1, 64, 64, 3), 0.3)

    def run(scale):
        pipe, params = _tiny_pipeline(clip_scale=0.0, steps=4)
        pipe = dataclasses.replace(
            pipe,
            config=pipe.config.replace(LPIPS_scale=scale, MS_SSIM_scale=0.0),
            lpips_fn=lpips_fn,
            use_init_losses=True,
        )
        params["lpips"] = lpips_params
        final, _ = guided_sample(
            pipe, params, jax.random.PRNGKey(7), batch_size=1, init_image=init
        )
        return np.asarray(final)

    f0, f1000 = run(0.0), run(1000.0)
    assert np.isfinite(f1000).all()
    assert float(np.abs(f0 - f1000).max()) > 1e-4


def test_multi_perceptor_ensemble():
    pipe, params = _tiny_pipeline(num_perceptors=2)
    final, _ = guided_sample(pipe, params, jax.random.PRNGKey(6))
    assert np.isfinite(np.asarray(final)).all()


def test_chunk_times_reconstruct_trajectory():
    """guided_sample(chunk_times=...) reports per-chunk (caps, n_steps,
    seconds) covering every executed step exactly once — the basis of
    bench.py's warm steady-state reconstruction (the relay worker only
    guarantees one full trajectory per process; see CLAUDE.md)."""
    import dataclasses

    from clip_diffusion_tpu.pipeline.guided import guided_sample

    pipe, params = _tiny_pipeline(steps=7)
    pipe = dataclasses.replace(
        pipe, sampler=dataclasses.replace(pipe.sampler, phase_segmented=True)
    )
    ct = []
    final, frames = guided_sample(
        pipe, params, jax.random.PRNGKey(0), batch_size=1,
        max_steps_per_dispatch=3, chunk_times=ct,
    )
    assert np.isfinite(np.asarray(final)).all()
    assert sum(n for _, n, _ in ct) == 7  # every step accounted for
    assert all(dt > 0 for _, _, dt in ct)
    assert all(isinstance(caps, tuple) and len(caps) == 2 for caps, _, _ in ct)
    # identical result with timing off (host-side only, no retrace)
    final2, _ = guided_sample(
        pipe, params, jax.random.PRNGKey(0), batch_size=1,
        max_steps_per_dispatch=3,
    )
    np.testing.assert_array_equal(np.asarray(final), np.asarray(final2))
