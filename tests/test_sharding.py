"""Pod-sharding tests on the fake 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
)


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("prompt", "seed")
    mesh1 = make_mesh(8, axes=("data",))
    assert mesh1.devices.shape == (8,)


def test_sharded_batch_matches_single_device():
    """The same jitted program on 1 vs 8 devices must agree bitwise for the
    same inputs (counter-based RNG is placement-invariant)."""
    from clip_diffusion_tpu.tests_support import build_tiny_pipeline

    pipe, params, sample_fn = build_tiny_pipeline(steps=5)
    key = jax.random.PRNGKey(0)

    out_single = sample_fn(pipe, params, key, 8)

    mesh = make_mesh(8)
    xsh = batch_sharding(mesh)
    out_sharded = jax.jit(
        lambda p, k: sample_fn(pipe, p, k, 8), out_shardings=xsh
    )(params, key)
    np.testing.assert_allclose(
        np.asarray(out_single), np.asarray(out_sharded), atol=1e-5
    )


def test_sharded_output_spans_devices():
    from clip_diffusion_tpu.tests_support import build_tiny_pipeline

    pipe, params, sample_fn = build_tiny_pipeline(steps=3)
    mesh = make_mesh(8)
    out = jax.jit(
        lambda p, k: sample_fn(pipe, p, k, 8),
        out_shardings=batch_sharding(mesh),
    )(params, jax.random.PRNGKey(1))
    assert len(out.sharding.device_set) == 8
    assert np.isfinite(np.asarray(out)).all()


def test_serve_guided_batch():
    """Pod-serving layout (BASELINE config 5 scaled down): prompts x seeds
    batch sharded over the mesh via the serving API."""
    from clip_diffusion_tpu.parallel.serving import serve_guided_batch
    from clip_diffusion_tpu.tests_support import build_tiny_pipeline

    pipe, params, _ = build_tiny_pipeline(steps=3)
    mesh = make_mesh(8)
    final, frames = serve_guided_batch(
        pipe, params, prompts_count=4, seeds_per_prompt=2, mesh=mesh
    )
    assert final.shape[0] == 8
    assert len(final.sharding.device_set) == 8
    assert np.isfinite(np.asarray(final)).all()
