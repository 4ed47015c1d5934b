from clip_diffusion_tpu.models.clip.model import (  # noqa: F401
    CLIP_PRESETS,
    CLIPConfig,
    CLIPModel,
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    clip_normalize,
    tiny_clip_config,
)
from clip_diffusion_tpu.models.clip.tokenizer import (  # noqa: F401
    CONTEXT_LENGTH,
    SimpleTokenizer,
    HashTokenizer,
    get_tokenizer,
    tokenize,
)
