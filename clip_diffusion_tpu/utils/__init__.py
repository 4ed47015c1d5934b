from clip_diffusion_tpu.utils.image_io import (  # noqa: F401
    array_to_image,
    create_gif,
    denormalize_image_zero_to_one,
    draw_index_on_grid_image,
    image_to_array,
    make_grid,
    normalize_image_neg_one_to_one,
)
from clip_diffusion_tpu.utils.profiling import clear_device_cache  # noqa: F401
from clip_diffusion_tpu.utils.progress import TaskState, store_task_state  # noqa: F401
from clip_diffusion_tpu.utils.seeds import random_seed  # noqa: F401
