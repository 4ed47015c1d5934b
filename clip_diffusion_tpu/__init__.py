"""clip-diffusion-tpu: a TPU-native CLIP-guided diffusion framework.

Built from scratch in JAX/Flax with pjit/shard_map and Pallas, providing the
capabilities of the reference `Penguin-jpg/clip-diffusion` service (see
SURVEY.md at the repo root): CLIP-guided diffusion sampling, latent-diffusion
text-to-image with classifier-free guidance, super-resolution, a prompt front
end, and CLIP-based image analysis — with the entire per-timestep guidance
loop fused into a single XLA program and batched generation sharded across
TPU chips.

Layout:
    config.py      immutable run configuration + dense cutout/loss schedules
    diffusion/     noise schedules, timestep respacing, DDIM/PLMS samplers
    models/        Flax model zoo: guided UNet, CLIP towers, LDM, ESRGAN, ...
    guidance/      cutout engine, loss library, guidance gradient (cond_fn)
    ops/           TPU-first tensor ops (separable resize, augmentations)
    parallel/      device mesh, sharded batch serving
    text/          prompt front end (translation, modifier retrieval)
    utils/         image I/O, GIF/grids, progress reporting, seeding
"""

__version__ = "0.1.0"

from clip_diffusion_tpu.config import Config, create_schedule  # noqa: F401
