from clip_diffusion_tpu.text.prompt import Prompt  # noqa: F401
from clip_diffusion_tpu.text.retrieval import EmbeddingIndex  # noqa: F401
