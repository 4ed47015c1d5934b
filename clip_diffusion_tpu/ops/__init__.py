from clip_diffusion_tpu.ops.resize import (  # noqa: F401
    axis_resize_weights,
    crop_resize,
    resize_image,
)
from clip_diffusion_tpu.ops.augment import (  # noqa: F401
    AugmentConfig,
    augment_batch,
    rgb_to_grayscale,
)
