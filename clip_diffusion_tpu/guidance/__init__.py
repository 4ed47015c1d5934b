from clip_diffusion_tpu.guidance.cutouts import (  # noqa: F401
    CutoutSpec,
    make_cutouts,
    make_cutouts_batch,
)
