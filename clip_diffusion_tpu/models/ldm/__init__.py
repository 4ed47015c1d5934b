from clip_diffusion_tpu.models.ldm.unet import LDMUNet, LDMUNetConfig  # noqa: F401
from clip_diffusion_tpu.models.ldm.autoencoder import (  # noqa: F401
    VQConfig,
    VQModel,
)
from clip_diffusion_tpu.models.ldm.bert import (  # noqa: F401
    BERTConfig,
    BERTEmbedder,
    bert_tokenize,
)
