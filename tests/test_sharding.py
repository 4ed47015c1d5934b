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


def test_serve_heterogeneous_prompts_matches_single_device():
    """BASELINE config 5: distinct prompts x seeds as one sharded batch.
    The 8-device mesh result must match the single-device run bitwise
    (placement invariance), with each row conditioned on its own prompt."""
    from clip_diffusion_tpu.parallel.serving import serve_guided_batch
    from clip_diffusion_tpu.tests_support import build_tiny_pipeline

    prompts = [f"prompt variant {i}" for i in range(4)]
    pipe, params, _ = build_tiny_pipeline(steps=3, prompt_texts=prompts)
    assert params["perceptors"][0]["text_embeddings"].shape[0] == 4

    final1, _ = serve_guided_batch(
        pipe, params, prompts_count=4, seeds_per_prompt=2, mesh=make_mesh(1)
    )
    final8, _ = serve_guided_batch(
        pipe, params, prompts_count=4, seeds_per_prompt=2, mesh=make_mesh(8)
    )
    assert final8.shape[0] == 8
    assert len(final8.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(final1), np.asarray(final8), atol=1e-5
    )
    # heterogeneity is live: different prompts' rows diverge
    assert float(jnp.abs(final8[0] - final8[2]).max()) > 1e-4


def test_heterogeneous_rows_follow_their_prompt():
    """Row i is guided by prompt i: changing only prompt 1's text changes
    only row 1 (identical RNG and weights otherwise)."""
    from clip_diffusion_tpu.parallel.serving import serve_guided_batch
    from clip_diffusion_tpu.tests_support import build_tiny_pipeline

    p0 = "a tranquil mountain lake"
    pipe_a, params_a, _ = build_tiny_pipeline(steps=3, prompt_texts=[p0, p0])
    pipe_b, params_b, _ = build_tiny_pipeline(
        steps=3, prompt_texts=[p0, "a neon cyberpunk alley"]
    )
    mesh = make_mesh(1)
    fa, _ = serve_guided_batch(pipe_a, params_a, 2, 1, mesh=mesh)
    fb, _ = serve_guided_batch(pipe_b, params_b, 2, 1, mesh=mesh)
    np.testing.assert_allclose(np.asarray(fa[0]), np.asarray(fb[0]), atol=1e-6)
    assert float(jnp.abs(fa[1] - fb[1]).max()) > 1e-4


def test_ensemble_parallel_matches_single_device():
    """Perceptor-parallel guidance (one CLIP per device along an `ensemble`
    axis, psum of guidance grads) must reproduce the single-device
    non-shared-cutout step."""
    import dataclasses

    from clip_diffusion_tpu.diffusion.sampling import init_history
    from clip_diffusion_tpu.parallel.ensemble import (
        build_ensemble_guided_step,
        ensemble_mesh,
    )
    from clip_diffusion_tpu.pipeline.guided import build_guided_step
    from clip_diffusion_tpu.tests_support import build_tiny_pipeline

    pipe, params, _ = build_tiny_pipeline(steps=5, num_perceptors=2)
    pipe = dataclasses.replace(
        pipe,
        config=pipe.config.replace(share_cutouts_across_perceptors=False),
    )
    step_ref, _ = build_guided_step(pipe)
    mesh = ensemble_mesh(2)
    step_ens = build_ensemble_guided_step(pipe, mesh)

    key = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 64, 64, 3), jnp.float32)
    carry = (x, init_history(x.shape), jnp.int32(0))
    step = jnp.int32(4)

    (x_ref, _, _), p_ref = jax.jit(
        lambda p, c: step_ref(p, c, step, key)
    )(params, carry)
    (x_ens, _, _), p_ens = jax.jit(
        lambda p, c: step_ens(p, c, step, key)
    )(params, carry)

    np.testing.assert_allclose(np.asarray(x_ens), np.asarray(x_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_ens), np.asarray(p_ref),
                               atol=1e-5)


def _tiny_latent_stack():
    from clip_diffusion_tpu.zoo import build_latent_models, build_latent_pipeline

    models = build_latent_models(tiny=True, param_dtype=jnp.float32)
    return build_latent_pipeline(models)


def test_serve_latent_batch_matches_single_device():
    """Pod-parallel latent sampling: the 8-device mesh run must agree with
    the single-device run (placement-invariant RNG; reductions may fuse
    differently per placement, hence allclose like the guided test), with
    distinct rows per (prompt, seed)."""
    from clip_diffusion_tpu.parallel.serving import serve_latent_batch

    pipe, params, text_encode = _tiny_latent_stack()
    ctx_c = text_encode(["a cat painting", "a photo of a dog"])
    ctx_u = text_encode([""])

    kwargs = dict(
        seeds_per_prompt=4, base_seed=7, height=32, width=32, steps=3,
        guidance_scale=5.0,
    )
    out1 = serve_latent_batch(pipe, params, ctx_c, ctx_u,
                              mesh=make_mesh(1), **kwargs)
    out8 = serve_latent_batch(pipe, params, ctx_c, ctx_u,
                              mesh=make_mesh(8), **kwargs)

    assert out8.shape[0] == 8
    assert len(out8.sharding.device_set) == 8
    a1, a8 = np.asarray(out1), np.asarray(out8)
    np.testing.assert_allclose(a1, a8, atol=1e-5)
    assert np.isfinite(a8).all()
    # every (prompt, seed) row is a distinct image
    flat = a8.reshape(8, -1)
    for i in range(8):
        for j in range(i + 1, 8):
            assert np.abs(flat[i] - flat[j]).max() > 1e-3


def test_serve_latent_batch_no_cfg_and_latents():
    """CFG-off path (context_uncond=None) returns sharded raw latents."""
    from clip_diffusion_tpu.parallel.serving import serve_latent_batch

    pipe, params, text_encode = _tiny_latent_stack()
    ctx_c = text_encode(["a single prompt"])

    out = serve_latent_batch(
        pipe, params, ctx_c, None, seeds_per_prompt=8, base_seed=3,
        height=32, width=32, steps=2, mesh=make_mesh(8), decode=False,
    )
    assert out.shape == (8, 16, 16, pipe.latent_channels)
    assert len(out.sharding.device_set) == 8
    assert np.isfinite(np.asarray(out)).all()


def test_serve_latent_batch_reuses_compiled_program():
    """Repeat requests with the same geometry must reuse ONE jitted
    program (a fresh closure per request would re-trace — and in a
    server, remote-recompile — the full CFG scan every call)."""
    from clip_diffusion_tpu.parallel.serving import _jit_latent_serve

    pipe, params, text_encode = _tiny_latent_stack()
    mesh = make_mesh(8)
    key = (pipe, mesh, True, 8, 32, 32, 2, 5.0, 0.0, "ddim", False)
    assert _jit_latent_serve(*key) is _jit_latent_serve(*key)


def test_replicate_collective_free_matches_device_put():
    """Collective-free replication must produce a fully-replicated array
    on every mesh device with unchanged values (it is the dryrun-safe
    stand-in for device_put(x, replicate(mesh)), whose broadcast
    all-reduce can abort on a 1-core host)."""
    from clip_diffusion_tpu.parallel.mesh import replicate_collective_free

    mesh = make_mesh(8)
    tree = {"w": np.arange(12.0, dtype=np.float32).reshape(3, 4),
            "step": np.int32(7)}
    rep = replicate_collective_free(tree, mesh)
    for name, leaf in rep.items():
        assert len(leaf.sharding.device_set) == 8
        assert leaf.sharding.is_fully_replicated
        np.testing.assert_array_equal(np.asarray(leaf), tree[name])
    # usable as a committed jit input with unchanged semantics
    out = jax.jit(lambda t: t["w"].sum() + t["step"])(rep)
    assert float(out) == float(tree["w"].sum() + 7)


def test_guided_step_pod_program_has_zero_collectives():
    """The pod-sharded guided hot loop must contain ZERO collectives
    (parallel/mesh.py's design claim): batch elements are independent, so
    any collective is a sharding-propagation regression.  A single
    all-reduce here once aborted the driver's fake-mesh dryrun on a
    1-core host (TV loss's edge-pad transpose fell back to a replicated
    cotangent — guidance/losses.py total_variational_loss)."""
    import re

    from clip_diffusion_tpu.diffusion.sampling import init_history
    from clip_diffusion_tpu.parallel.mesh import replicate_collective_free
    from clip_diffusion_tpu.pipeline.guided import build_guided_step
    from clip_diffusion_tpu.tests_support import build_tiny_pipeline

    mesh = make_mesh(8)
    pipe, params, _ = build_tiny_pipeline(steps=5)
    step_fn, _ = build_guided_step(pipe)
    shape = (8, pipe.config.height, pipe.config.width, 3)
    params = replicate_collective_free(params, mesh)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32),
        batch_sharding(mesh),
    )
    carry = (
        x,
        replicate_collective_free(np.asarray(init_history(shape)), mesh),
        replicate_collective_free(np.int32(0), mesh),
    )
    key = replicate_collective_free(np.asarray(jax.random.PRNGKey(1)), mesh)

    @jax.jit
    def one_step(params, carry, key):
        (x_next, _, _), pred_x0 = step_fn(
            params, carry, jnp.int32(pipe.schedule.num_steps - 1), key
        )
        return x_next, pred_x0

    txt = one_step.lower(params, carry, key).compile().as_text()
    colls = [
        ln.strip()[:160]
        for ln in txt.splitlines()
        if re.search(
            r"= \S+ (all-reduce|all-gather|collective-permute"
            r"|reduce-scatter|all-to-all)\(",
            ln,
        )
    ]
    assert not colls, f"collectives leaked into the guided step: {colls}"


def test_latent_pod_program_has_zero_collectives():
    """The pod-sharded latent CFG scan + VQ decode must also carry zero
    collectives (batch-elementwise throughout; same design claim as the
    guided step, same failure class as the TV-loss edge-pad all-reduce)."""
    import re

    from clip_diffusion_tpu.parallel.mesh import replicate_collective_free
    from clip_diffusion_tpu.parallel.serving import _jit_latent_serve

    pipe, params, text_encode = _tiny_latent_stack()
    mesh = make_mesh(8)
    run = _jit_latent_serve(pipe, mesh, True, 8, 32, 32, 2, 5.0, 0.0,
                            "ddim", True)
    params = replicate_collective_free(params, mesh)
    ctx = text_encode(["a cat"] * 8)
    ctx = jax.device_put(np.asarray(ctx), batch_sharding(mesh))
    key = replicate_collective_free(
        np.asarray(jax.random.PRNGKey(0)), mesh
    )
    txt = run.lower(params, ctx, ctx, key).compile().as_text()
    colls = [
        ln.strip()[:160]
        for ln in txt.splitlines()
        if re.search(
            r"= \S+ (all-reduce|all-gather|collective-permute"
            r"|reduce-scatter|all-to-all)\(",
            ln,
        )
    ]
    assert not colls, f"collectives leaked into the latent pod program: {colls}"


def test_ensemble_program_has_exactly_one_psum():
    """The perceptor-parallel step's ONLY collective must be its designed
    psum of guidance gradients — extra collectives would be a
    sharding-propagation regression (same audit as the guided/latent
    zero-collective tests; here the expected count is one)."""
    import dataclasses
    import re

    from clip_diffusion_tpu.diffusion.sampling import init_history
    from clip_diffusion_tpu.parallel.ensemble import (
        build_ensemble_guided_step,
        ensemble_mesh,
    )
    from clip_diffusion_tpu.tests_support import build_tiny_pipeline

    pipe, params, _ = build_tiny_pipeline(steps=5, num_perceptors=2)
    pipe = dataclasses.replace(
        pipe,
        config=pipe.config.replace(share_cutouts_across_perceptors=False),
    )
    step_ens = build_ensemble_guided_step(pipe, ensemble_mesh(2))
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 64, 64, 3), jnp.float32)
    carry = (x, init_history(x.shape), jnp.int32(0))
    f = jax.jit(
        lambda p, c: step_ens(p, c, jnp.int32(4), jax.random.PRNGKey(7))
    )
    txt = f.lower(params, carry).compile().as_text()
    colls = [
        ln.strip()[:160]
        for ln in txt.splitlines()
        if re.search(
            r"= \S+ (all-reduce|all-gather|collective-permute"
            r"|reduce-scatter|all-to-all)\(",
            ln,
        )
    ]
    assert len(colls) == 1 and "all-reduce" in colls[0], colls
