"""Public sampling API — the reference's `sample.py` entry points, rebuilt.

`guided_diffusion_sample` and `latent_diffusion_sample` keep the reference's
knob names and semantics (reference sample.py:59-95 and 317-346) so a
reference user can switch directly.  Differences by design:

* `num_batches` images generate as ONE sharded batch instead of serially
  re-iterating a generator (the reference's per-batch loop restarts an
  exhausted generator — SURVEY.md §3 quirks; the intended behavior is
  implemented here);
* models are passed in (or built once lazily) instead of re-downloaded per
  request (the reference reloads the UNet every call, sample.py:97-99);
* progress flows through utils/progress.TaskState + Uploader hooks, which
  reproduce the Anvil task-state key contract.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.config import Config
from clip_diffusion_tpu.diffusion.sampling import SamplerConfig
from clip_diffusion_tpu.pipeline.guided import guided_sample as _run_guided
from clip_diffusion_tpu.pipeline.latent import (
    LatentPipeline,
    decode_latents,
    latent_sample,
)
from clip_diffusion_tpu.text.prompt import Prompt
from clip_diffusion_tpu.utils.image_io import (
    array_to_image,
    create_gif,
    draw_index_on_grid_image,
    load_image,
    load_mask,
    make_grid,
    normalize_image_neg_one_to_one,
)
from clip_diffusion_tpu.utils.progress import (
    LocalUploader,
    StepTimer,
    store_task_state,
)
from clip_diffusion_tpu.utils.seeds import random_seed
from clip_diffusion_tpu.zoo import build_models, build_pipeline

OUTPUT_PATH = "output_images"


def guided_diffusion_sample(
    prompt: str = "A cute golden retriever.",
    use_auto_modifiers: bool = False,
    num_modifiers: int = 1,
    custom_model_params=None,
    dynamic_thresholding_percentile: float = 0.995,
    seed: Optional[int] = None,
    init_image=None,
    sample_mode: str = "ddim",
    steps: int = 200,
    skip_timesteps: int = 0,
    eta: float = 0.8,
    num_batches: int = 1,
    gif_duration: int = 500,
    config: Optional[Config] = None,
    models=None,
    modifier_bank=None,
    uploader=None,
    output_dir: str = OUTPUT_PATH,
    images_per_dispatch: Optional[int] = None,
    save_every_step: bool = False,
):
    """CLIP-guided generation (reference sample.py:59-314).

    Returns {"images": [paths], "gif_urls": [urls], "seed": int}.
    `custom_model_params`: converted params for a finetuned UNet (the
    reference's custom_model_path checkpoint selection, sample.py:64).

    `save_every_step`: opt-in per-step trajectory record — a PNG of
    pred_x0 for EVERY timestep under <output_dir>/guided/steps/ (the
    reference writes one unconditionally, sample.py:290-295; here it is
    opt-in because per-step host I/O from the scan's io_callback slows the
    chip-resident fast path).  The every-5-step progress upload keeps its
    contract either way.

    `images_per_dispatch`: cap the on-device batch per trajectory; larger
    `num_batches` run as sequential sub-batches with independent fold_in
    keys (the reference generates serially, sample.py:278; one 512^2 image
    already saturates a v5e chip's HBM, so real 512^2 multi-image requests
    should pass 1)."""
    config = config or Config()
    uploader = uploader or LocalUploader(output_dir)
    batch_folder = os.path.join(output_dir, "guided")
    os.makedirs(batch_folder, exist_ok=True)

    p = Prompt(prompt, use_auto_modifiers, num_modifiers, modifier_bank)
    if use_auto_modifiers:
        store_task_state("new_prompt", p.text)

    init_arr = None
    if init_image is not None:
        init_arr = normalize_image_neg_one_to_one(
            load_image(init_image, (config.width, config.height))
        )[None]
    # init-image losses follow the reference gate: LPIPS (x1000 default) and
    # MS-SSIM apply whenever an init image is present and their scale is on
    # (reference sample.py:216-226, losses.py:38-40)
    need_lpips = init_arr is not None and config.LPIPS_scale > 0
    use_init_losses = init_arr is not None and (
        config.LPIPS_scale > 0 or config.MS_SSIM_scale > 0
    )

    if models is None:
        models = build_models(config, image_size=512,
                              with_aesthetic=config.aesthetic_scale > 0,
                              with_lpips=need_lpips)
    elif need_lpips and models.lpips is None:
        # shallow copy, NOT in-place: attaching the VGG tree to the caller's
        # (often server-shared) zoo would pin its HBM for every later
        # request that never asked for LPIPS
        import dataclasses

        from clip_diffusion_tpu.zoo import build_lpips

        models = dataclasses.replace(models, lpips=build_lpips())
    if custom_model_params is not None:
        # shallow copy: mutating the caller's (often server-shared) zoo
        # would leak the finetune into every subsequent default request
        import dataclasses

        models = dataclasses.replace(models, unet_params=custom_model_params)

    if not seed:
        seed = random_seed()
    key = jax.random.PRNGKey(int(seed))

    sampler = SamplerConfig(
        mode=sample_mode,
        steps=steps,
        eta=eta,
        skip_timesteps=skip_timesteps,
        order=2,
        dynamic_thresholding_percentile=dynamic_thresholding_percentile,
    )
    pipe, params = build_pipeline(
        models, config, [(p.text, p.weight)], sampler,
        use_init_losses=use_init_losses,
    )

    timer = StepTimer()
    progress_every = 1 if save_every_step else 5
    steps_folder = os.path.join(batch_folder, "steps")
    if save_every_step:
        os.makedirs(steps_folder, exist_ok=True)

    def progress_cb(pos, imgs):
        timer.tick(progress_every)
        pos = int(pos)
        img = array_to_image((np.asarray(imgs[0]) + 1) / 2)
        if save_every_step:
            img.save(os.path.join(steps_folder, f"guided_step_{pos:04}.png"))
        if pos % 5 == 0:  # the reference's every-5-step upload contract
            path = os.path.join(batch_folder, f"guided_progress_{pos:04}.png")
            img.save(path)
            store_task_state("current_step", pos + 1)
            store_task_state("current_result",
                             uploader.upload(path, minutes=10))

    store_task_state("current_result", None)
    chunk = images_per_dispatch or num_batches
    finals, frame_stacks = [], []
    done = 0
    sub = 0
    while done < num_batches:
        b = min(chunk, num_batches - done)
        store_task_state("current_batch", sub)
        final, frames = _run_guided(
            pipe,
            params,
            key if sub == 0 else jax.random.fold_in(key, sub),
            batch_size=b,
            init_image=init_arr,
            progress_callback=progress_cb,
            progress_every=progress_every,
        )
        finals.append(np.asarray(final))
        frame_stacks.append(np.asarray(frames))
        done += b
        sub += 1
    jax.effects_barrier()

    image_paths = []
    gif_urls = []
    final_np = (np.concatenate(finals, axis=0) + 1) / 2
    frames_np = (np.concatenate(frame_stacks, axis=1) + 1) / 2
    for b in range(num_batches):
        img_path = os.path.join(batch_folder, f"guided_{b}.png")
        array_to_image(final_np[b]).save(img_path)
        image_paths.append(img_path)
        gif_path = os.path.join(batch_folder, f"guided_{b}.gif")
        create_gif(frames_np[:, b], gif_path, gif_duration)
        gif_urls.append(uploader.upload(gif_path, minutes=10))
    store_task_state("current_step", pipe.schedule.num_steps)
    return {"images": image_paths, "gif_urls": gif_urls, "seed": int(seed)}


# lazily-built default LDM stack (reference sample.py:347-353 caches the
# loaded model in module globals); keyed so tests can clear it
_LATENT_STACK_CACHE: dict = {}


def _default_latent_stack():
    if "stack" not in _LATENT_STACK_CACHE:
        from clip_diffusion_tpu.zoo import (
            build_latent_models,
            build_latent_pipeline,
        )

        models = build_latent_models()
        _LATENT_STACK_CACHE["stack"] = build_latent_pipeline(models)
    return _LATENT_STACK_CACHE["stack"]


def latent_diffusion_sample(
    prompt: str = "A cute golden retriever.",
    seed: Optional[int] = None,
    init_image=None,
    mask_image=None,
    sample_mode: str = "ddim",
    diffusion_steps: int = 50,
    eta: float = 0.0,
    latent_diffusion_guidance_scale: float = 5,
    num_iterations: int = 3,
    num_batches: int = 3,
    sample_width: int = 256,
    sample_height: int = 256,
    pipe: Optional[LatentPipeline] = None,
    latent_params=None,
    text_encode=None,
    upscaler=None,
    uploader=None,
    output_dir: str = OUTPUT_PATH,
):
    """Latent-diffusion txt2img / img2img / inpaint + SR (reference
    sample.py:317-460).  Returns {"grid_url", "images", "seed"}.

    When `pipe`/`latent_params`/`text_encode` are omitted the LDM stack is
    built lazily ONCE and cached module-wide — converted checkpoints when
    provisioned, random init otherwise — matching the reference's
    first-call lazy load into module globals (reference sample.py:347-353).
    `upscaler(images01) -> images01` is the Real-ESRGAN hook
    (models/esrgan.upscale partial); injection kwargs remain for tests."""
    injected = (pipe, latent_params, text_encode)
    if all(v is None for v in injected):
        pipe, latent_params, text_encode = _default_latent_stack()
    elif any(v is None for v in injected):
        # a partial injection would silently sample from the default
        # (lazily random-init) stack instead of the caller's models
        raise ValueError(
            "latent_diffusion_sample: pass pipe, latent_params and "
            "text_encode together (or none of them for the default "
            "lazily-built stack)"
        )
    uploader = uploader or LocalUploader(output_dir)
    batch_folder = os.path.join(output_dir, "latent")
    os.makedirs(batch_folder, exist_ok=True)

    p = Prompt(prompt, False, 0)
    if not seed:
        seed = random_seed()
    key = jax.random.PRNGKey(int(seed))

    ctx_cond = text_encode([p.text] * num_batches)
    ctx_uncond = None
    if latent_diffusion_guidance_scale > 0:
        ctx_uncond = text_encode([""] * num_batches)

    x0_latent = None
    mask = None
    if init_image is not None and mask_image is not None:
        init_arr = normalize_image_neg_one_to_one(
            load_image(init_image, (sample_width, sample_height))
        )[None]
        z = pipe.encode(latent_params["vq"], jnp.asarray(init_arr))
        x0_latent = jnp.repeat(z, num_batches, axis=0)
        m = load_mask(
            mask_image,
            (sample_width // pipe.downsample, sample_height // pipe.downsample),
        )[None]
        mask = jnp.repeat(jnp.asarray(m), num_batches, axis=0)

    all_images = []
    count = 0
    for iteration in range(num_iterations):
        z = latent_sample(
            pipe,
            latent_params,
            jax.random.fold_in(key, iteration),
            ctx_cond,
            ctx_uncond,
            batch_size=num_batches,
            height=sample_height,
            width=sample_width,
            steps=diffusion_steps,
            guidance_scale=latent_diffusion_guidance_scale,
            eta=eta,
            mode=sample_mode,
            x0_latent=x0_latent,
            mask=mask,
        )
        images01 = np.asarray(decode_latents(pipe, latent_params["vq"], z))
        for img in images01:
            path = os.path.join(batch_folder, f"latent_{count}.png")
            array_to_image(img).save(path)
            count += 1
        store_task_state("current_iteration", iteration + 1)
        all_images.append(images01)

    stacked = np.concatenate(all_images, axis=0)
    grid = make_grid(stacked, nrow=num_batches)
    grid_img = draw_index_on_grid_image(
        array_to_image(grid), num_iterations, num_batches,
        sample_height, sample_width,
    )
    grid_path = os.path.join(batch_folder, "latent_grid_image.png")
    grid_img.save(grid_path)
    grid_url = uploader.upload(grid_path)

    if upscaler is not None:
        for i in range(count):
            path = os.path.join(batch_folder, f"latent_{i}.png")
            up = upscaler(load_image(path)[None])
            os.makedirs(os.path.join(batch_folder, "sr"), exist_ok=True)
            array_to_image(np.asarray(up)[0]).save(
                os.path.join(batch_folder, "sr", f"latent_{i}.png")
            )

    return {
        "grid_url": grid_url,
        "images": [
            os.path.join(batch_folder, f"latent_{i}.png") for i in range(count)
        ],
        "seed": int(seed),
    }
