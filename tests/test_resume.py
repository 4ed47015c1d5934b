"""Preemption-safe mid-trajectory resume (SURVEY.md §5 checkpoint/resume)."""

import os
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

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
    # key=None: the state carries the trajectory's base key (VERDICT r3
    # item 6 — resume must not depend on the caller re-supplying it)
    resumed, _ = guided_sample(
        pipe, params, key=None, batch_size=1, resume_state=restored
    )
    np.testing.assert_allclose(
        np.asarray(resumed), np.asarray(full), atol=1e-6
    )


def test_resume_rejects_mismatched_key(tmp_path):
    """An explicit key that differs from the checkpointed one must raise —
    the per-step RNG is fold_in of the base key, so a silent mismatch would
    resume a DIFFERENT trajectory."""
    pipe, params, _ = build_tiny_pipeline(steps=8)
    _, _, state = guided_sample(
        pipe, params, jax.random.PRNGKey(5), batch_size=1, stop_after=2,
        return_state=True,
    )
    with pytest.raises(ValueError, match="different PRNG key"):
        guided_sample(pipe, params, jax.random.PRNGKey(6), batch_size=1,
                      resume_state=state)
    # matching explicit key is fine
    guided_sample(pipe, params, jax.random.PRNGKey(5), batch_size=1,
                  resume_state=state, stop_after=1)
    # no key and no resume state is an error, not a silent default
    with pytest.raises(ValueError, match="key is required"):
        guided_sample(pipe, params, key=None, batch_size=1)


_CHILD = textwrap.dedent("""
    import sys
    import jax
    # numeric config must match tests/conftest.py or results can't be
    # bitwise-compared across the process boundary
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    from clip_diffusion_tpu.pipeline.guided import guided_sample
    from clip_diffusion_tpu.tests_support import build_tiny_pipeline
    from clip_diffusion_tpu.utils.checkpoint import SamplingState, load_params

    state_path, params_path, out_path = sys.argv[1:4]
    pipe, template, _ = build_tiny_pipeline(steps=8)
    params = load_params(params_path, template)
    state = SamplingState.load(state_path)
    resumed, _ = guided_sample(pipe, params, key=None, batch_size=1,
                               resume_state=state)
    np.save(out_path, np.asarray(resumed))
""")


def test_resume_cross_process_bit_exact(tmp_path):
    """VERDICT r3 item 6 'done' criterion: save mid-trajectory -> a NEW
    process restores params (orbax) + state (npz, carrying the base key)
    and resumes -> bit-identical to the uninterrupted run.  Nothing crosses
    the process boundary except the two checkpoint files."""
    from clip_diffusion_tpu.utils.checkpoint import save_params

    pipe, params, _ = build_tiny_pipeline(steps=8)
    key = jax.random.PRNGKey(9)
    full, _ = guided_sample(pipe, params, key, batch_size=1)

    _, _, state = guided_sample(
        pipe, params, key, batch_size=1, stop_after=4, return_state=True
    )
    state_path = str(tmp_path / "state.npz")
    params_path = str(tmp_path / "params")
    out_path = str(tmp_path / "resumed.npy")
    state.save(state_path)
    save_params(params_path, params)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # child needs no fake mesh
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, state_path, params_path, out_path],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    resumed = np.load(out_path)
    # same tolerance as the in-process resume test: resume chunk boundaries
    # differ from the uninterrupted run's, so XLA fusion may differ in the
    # last ulp even on one backend
    np.testing.assert_allclose(resumed, np.asarray(full), atol=1e-6)
