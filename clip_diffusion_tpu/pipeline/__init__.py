from clip_diffusion_tpu.pipeline.guided import (  # noqa: F401
    GuidedPipeline,
    Perceptor,
    guided_sample,
)
