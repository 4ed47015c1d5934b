import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.zoo import build_latent_models, build_latent_pipeline


@pytest.fixture(scope="module")
def latent_stack():
    models = build_latent_models(tiny=True, param_dtype=jnp.float32)
    return build_latent_pipeline(models)


def test_latent_end_to_end_txt2img(latent_stack):
    """Full LDM path: BERT encode -> CFG latent scan -> VQ decode."""
    from clip_diffusion_tpu.pipeline.latent import decode_latents, latent_sample

    pipe, lparams, text_encode = latent_stack
    ctx_c = text_encode(["a test prompt"] * 2)
    ctx_u = text_encode([""] * 2)
    assert ctx_c.shape[0] == 2 and ctx_c.shape[1] == 77
    z = latent_sample(
        pipe, lparams, jax.random.PRNGKey(0), ctx_c, ctx_u,
        batch_size=2, height=32, width=32, steps=5, guidance_scale=5.0,
    )
    assert z.shape == (2, 16, 16, 4)
    imgs = decode_latents(pipe, lparams["vq"], z)
    assert imgs.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    assert 0.0 <= float(imgs.min()) and float(imgs.max()) <= 1.0


def test_latent_img2img_encode(latent_stack):
    import jax.numpy as jnp

    pipe, lparams, _ = latent_stack
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3),
                             minval=-1.0, maxval=1.0)
    z = pipe.encode(lparams["vq"], img)
    assert z.shape == (1, 16, 16, 4)


def test_public_latent_api(tmp_path, latent_stack):
    from clip_diffusion_tpu.sample import latent_diffusion_sample

    pipe, lparams, text_encode = latent_stack
    out = latent_diffusion_sample(
        prompt="a tiny test",
        seed=7,
        diffusion_steps=4,
        num_iterations=2,
        num_batches=2,
        sample_width=32,
        sample_height=32,
        pipe=pipe,
        latent_params=lparams,
        text_encode=text_encode,
        output_dir=str(tmp_path),
    )
    import os

    assert len(out["images"]) == 4  # 2 iterations x 2 batch
    for p in out["images"]:
        assert os.path.exists(p)
    assert out["grid_url"].startswith("file://")
    from clip_diffusion_tpu.utils.progress import get_task_state

    assert get_task_state("current_iteration") == 2


def test_latent_default_build_lazy(tmp_path, monkeypatch):
    """Calling latent_diffusion_sample with NO pipe kwargs self-builds the
    LDM stack lazily once and caches it (reference sample.py:347-353;
    VERDICT r2 item 8).  The builder is monkeypatched to the tiny stack so
    CI doesn't init 1.45B params."""
    import clip_diffusion_tpu.sample as sample_mod
    import clip_diffusion_tpu.zoo as zoo

    builds = []
    real_build = zoo.build_latent_models

    def tiny_build(*a, **kw):
        builds.append(1)
        return real_build(tiny=True, param_dtype=jnp.float32)

    monkeypatch.setattr(zoo, "build_latent_models", tiny_build)
    monkeypatch.setattr(sample_mod, "_LATENT_STACK_CACHE", {})

    out = sample_mod.latent_diffusion_sample(
        prompt="a lazy test", seed=3, diffusion_steps=2, num_iterations=1,
        num_batches=1, sample_width=32, sample_height=32,
        output_dir=str(tmp_path),
    )
    assert len(out["images"]) == 1
    # second call reuses the cached stack — no rebuild
    sample_mod.latent_diffusion_sample(
        prompt="again", seed=4, diffusion_steps=2, num_iterations=1,
        num_batches=1, sample_width=32, sample_height=32,
        output_dir=str(tmp_path),
    )
    assert builds == [1]


def test_load_or_init_strict_on_corrupt_checkpoint(tmp_path, monkeypatch):
    """A PRESENT but unusable checkpoint must raise, not silently serve
    random weights (deploy-path failure policy; lenient mode opt-in)."""
    import flax.linen as nn

    import clip_diffusion_tpu.zoo as zoo

    dense = nn.Dense(4)
    init_fn = lambda: dense.init(jax.random.PRNGKey(0), jnp.ones((1, 4)))

    # corrupt tree: a directory that orbax cannot read
    bad = tmp_path / "dense_head"
    bad.mkdir()
    (bad / "garbage").write_text("not a checkpoint")
    monkeypatch.delenv("CLIP_DIFFUSION_TPU_LENIENT_LOAD", raising=False)
    with pytest.raises(RuntimeError, match="present but unusable"):
        zoo.load_or_init("dense_head", init_fn, param_dtype=jnp.float32,
                         root=str(tmp_path))

    # shape mismatch: a valid tree for a DIFFERENT template also raises
    from clip_diffusion_tpu.utils.checkpoint import save_params

    other = nn.Dense(8).init(jax.random.PRNGKey(0), jnp.ones((1, 4)))
    save_params(str(tmp_path / "dense_head2"),
                jax.tree_util.tree_map(np.asarray, other))
    with pytest.raises(RuntimeError, match="unusable|does not match"):
        zoo.load_or_init("dense_head2", init_fn, param_dtype=jnp.float32,
                         root=str(tmp_path))

    # lenient escape hatch restores warn-and-init
    monkeypatch.setenv("CLIP_DIFFUSION_TPU_LENIENT_LOAD", "1")
    with pytest.warns(UserWarning, match="lenient"):
        params = zoo.load_or_init("dense_head", init_fn,
                                  param_dtype=jnp.float32,
                                  root=str(tmp_path))
    assert params["params"]["kernel"].shape == (4, 4)

    # ABSENT checkpoint initializes silently in strict mode too
    monkeypatch.delenv("CLIP_DIFFUSION_TPU_LENIENT_LOAD", raising=False)
    params = zoo.load_or_init("never_saved", init_fn,
                              param_dtype=jnp.float32, root=str(tmp_path))
    assert params["params"]["kernel"].shape == (4, 4)
