"""Preemption-safe mid-trajectory resume (SURVEY.md §5 checkpoint/resume)."""

import jax
import numpy as np

from clip_diffusion_tpu.pipeline.guided import guided_sample
from clip_diffusion_tpu.tests_support import build_tiny_pipeline


def test_resume_bit_exact(tmp_path):
    pipe, params, _ = build_tiny_pipeline(steps=8)
    key = jax.random.PRNGKey(5)

    # uninterrupted run
    full, _ = guided_sample(pipe, params, key, batch_size=1)

    # interrupted: run 3 steps, checkpoint, reload, resume
    _, _, state = guided_sample(
        pipe, params, key, batch_size=1, stop_after=3, return_state=True
    )
    assert state.step == 8 - 1 - 3  # next step to execute
    path = str(tmp_path / "state.npz")
    state.save(path)

    from clip_diffusion_tpu.utils.checkpoint import SamplingState

    restored = SamplingState.load(path)
    resumed, _ = guided_sample(
        pipe, params, key, batch_size=1, resume_state=restored
    )
    np.testing.assert_allclose(
        np.asarray(resumed), np.asarray(full), atol=1e-6
    )
