"""Flax model zoo: every model family the reference loads externally
(SURVEY.md §2.2), natively reimplemented for TPU."""

from clip_diffusion_tpu.models.aesthetic import (  # noqa: F401
    LinearAestheticPredictor,
    MLPAestheticPredictor,
    make_aesthetic_predictor,
)
