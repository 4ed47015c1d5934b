"""Chunked CLIP cut-batch embedding (round-5 perf work).

`Config.clip_cut_chunk` splits each tower's cut batch into sequential
chunks inside the guidance grad (pipeline/guided._chunked_embed).  The
math is identical per cut — these tests pin that the full guided step
produces the same trajectory state with chunking on/off, so the measured
TPU win (L/14 64-cut fwd+bwd 255.5 -> 198.4 ms) can never silently change
sampling results.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.diffusion.sampling import init_history
from clip_diffusion_tpu.pipeline.guided import build_guided_step
from clip_diffusion_tpu.tests_support import build_tiny_pipeline


def _one_step(pipe, params, chunk):
    pipe = dataclasses.replace(
        pipe, config=pipe.config.replace(clip_cut_chunk=chunk)
    )
    step_fn, _ = build_guided_step(pipe)
    shape = (1, pipe.config.height, pipe.config.width, 3)
    x = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)
    carry = (x, init_history(shape), jnp.int32(0))
    (x_next, _, _), pred_x0 = step_fn(
        params, carry, jnp.int32(pipe.schedule.num_steps - 1),
        jax.random.PRNGKey(8),
    )
    return np.asarray(x_next), np.asarray(pred_x0)


def test_chunked_step_matches_monolithic():
    pipe, params, _ = build_tiny_pipeline(steps=5)
    x_mono, p_mono = _one_step(pipe, params, chunk=0)
    # tiny pipeline cut count is small; chunk=2 forces several chunks
    x_chunk, p_chunk = _one_step(pipe, params, chunk=2)
    np.testing.assert_allclose(x_chunk, x_mono, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(p_chunk, p_mono, atol=1e-5, rtol=1e-5)


def test_chunk_not_dividing_batch_is_exact():
    # tail chunk smaller than `chunk` must embed identically
    pipe, params, _ = build_tiny_pipeline(steps=5)
    x_a, _ = _one_step(pipe, params, chunk=3)
    x_b, _ = _one_step(pipe, params, chunk=0)
    np.testing.assert_allclose(x_a, x_b, atol=1e-5, rtol=1e-5)


def test_chunk_larger_than_batch_is_monolithic_path():
    pipe, params, _ = build_tiny_pipeline(steps=5)
    x_a, _ = _one_step(pipe, params, chunk=10_000)
    x_b, _ = _one_step(pipe, params, chunk=0)
    np.testing.assert_array_equal(x_a, x_b)
