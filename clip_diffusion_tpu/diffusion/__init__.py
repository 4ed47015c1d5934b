from clip_diffusion_tpu.diffusion.schedule import (  # noqa: F401
    NoiseSchedule,
    linear_betas,
    space_timesteps,
    make_schedule,
)
from clip_diffusion_tpu.diffusion.sampling import (  # noqa: F401
    SamplerConfig,
    dynamic_threshold,
    ddim_step,
    plms_step,
    q_sample,
)
