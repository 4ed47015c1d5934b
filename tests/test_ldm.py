import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.models.ldm.autoencoder import VQConfig, VQModel
from clip_diffusion_tpu.models.ldm.bert import (
    BERTConfig,
    BERTEmbedder,
    bert_tokenize,
)
from clip_diffusion_tpu.models.ldm.unet import LDMUNet, LDMUNetConfig
from clip_diffusion_tpu.pipeline.latent import (
    LatentPipeline,
    decode_latents,
    latent_sample,
    ldm_alphas_cumprod,
    ldm_ddim_tables,
)


# ---------------- LDM UNet ----------------

@pytest.fixture(scope="module")
def ldm_unet():
    cfg = LDMUNetConfig.tiny()
    model = LDMUNet(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, 8, 8, 4)),
        jnp.zeros((1,)),
        jnp.ones((1, 5, cfg.context_dim)),
    )
    return cfg, model, params


def test_ldm_unet_shapes(ldm_unet):
    cfg, model, params = ldm_unet
    out = model.apply(
        params,
        jnp.ones((2, 8, 8, 4)),
        jnp.array([1.0, 500.0]),
        jnp.ones((2, 5, cfg.context_dim)),
    )
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_ldm_unet_context_sensitivity(ldm_unet):
    cfg, model, params = ldm_unet
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.PRNGKey(7), p.shape,
                                               p.dtype),
        params,
    )
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([100.0])
    c1 = jnp.ones((1, 5, cfg.context_dim))
    c2 = -jnp.ones((1, 5, cfg.context_dim))
    o1 = model.apply(params, x, t, c1)
    o2 = model.apply(params, x, t, c2)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


def test_flagship_ldm_param_count():
    """txt2img-1p4B UNet should be ~870M params (the 1.45B total includes
    the 1280-wide 32-layer BERT ~590M and the VQ autoencoder)."""
    cfg = LDMUNetConfig()
    model = LDMUNet(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, 32, 32, 4)),
            jnp.zeros((1,)),
            jnp.ones((1, 77, 1280)),
        )
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes))
    assert 700e6 < n < 1000e6, f"{n/1e6:.0f}M"


# ---------------- VQ autoencoder ----------------

@pytest.fixture(scope="module")
def vq():
    cfg = VQConfig.tiny()
    model = VQModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    return cfg, model, params


def test_vq_encode_decode_shapes(vq):
    cfg, model, params = vq
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1)
    z = model.apply(params, img, method=VQModel.encode)
    assert z.shape == (2, 16, 16, 4)  # f2 for the tiny (1,2) ch_mult
    out = model.apply(params, z, method=VQModel.decode)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_vq_quantize_maps_to_codebook(vq):
    cfg, model, params = vq
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 4))
    zq = model.apply(params, z, method=VQModel.quantize)
    cb = np.asarray(params["params"]["codebook"])
    flat = np.asarray(zq).reshape(-1, 4)
    for v in flat:
        d = np.abs(cb - v).sum(axis=1).min()
        assert d < 1e-5


def test_flagship_vq_f8_downsampling():
    cfg = VQConfig()  # (1,2,2,4) -> f8
    model = VQModel(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    )
    z_shape = jax.eval_shape(
        lambda p: model.apply(p, jnp.ones((1, 64, 64, 3)),
                              method=VQModel.encode),
        shapes,
    )
    assert z_shape.shape == (1, 8, 8, 4)


# ---------------- BERT embedder ----------------

def test_bert_tokenize():
    toks = bert_tokenize(["a cute dog", "hello"])
    assert toks.shape == (2, 77)
    assert (toks[:, 0] == 101).all()  # CLS
    for row in toks:
        nz = row[row > 0]
        assert nz[-1] == 102  # SEP


def test_bert_embedder_shapes():
    cfg = BERTConfig.tiny()
    model = BERTEmbedder(cfg)
    toks = jnp.asarray(bert_tokenize(["a test"]))
    params = model.init(jax.random.PRNGKey(0), toks)
    out = model.apply(params, toks)
    assert out.shape == (1, 77, cfg.n_embed)
    assert np.isfinite(np.asarray(out)).all()


def test_bert_flagship_heads():
    # x-transformers defaults: 8 heads x 64 dim_head = 512 inner width,
    # independent of n_embed (the real checkpoint's to_q is (1280, 512))
    cfg = BERTConfig()
    assert cfg.n_heads == 8
    assert cfg.n_heads * cfg.dim_head == 512


# ---------------- latent sampling ----------------

def test_ldm_schedule_tables():
    acp = ldm_alphas_cumprod()
    assert acp.shape == (1000,)
    assert 0.998 < acp[0] < 1.0
    assert acp[-1] < 0.01
    t = ldm_ddim_tables(50, eta=0.0)
    assert t["timesteps"].shape == (50,)
    assert int(t["timesteps"][0]) == 1
    assert int(t["timesteps"][-1]) == 981
    np.testing.assert_allclose(np.asarray(t["sigmas"]), 0.0)


def _latent_pipe(ldm_unet):
    cfg, model, params = ldm_unet
    # perturb zero-initialized output heads so the model is non-trivial
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.PRNGKey(11),
                                               p.shape, p.dtype),
        params,
    )
    pipe = LatentPipeline(
        unet_apply=lambda p, x, t, c: model.apply(p, x, t, c),
        downsample=1,  # operate on 8x8 "latents" directly in the tiny test
    )
    return pipe, {"unet": params}


def test_latent_sample_cfg(ldm_unet):
    cfg, _, _ = ldm_unet
    pipe, lparams = _latent_pipe(ldm_unet)
    ctx_c = jnp.ones((2, 5, cfg.context_dim))
    ctx_u = jnp.zeros((2, 5, cfg.context_dim))
    z = latent_sample(
        pipe, lparams, jax.random.PRNGKey(0), ctx_c, ctx_u,
        batch_size=2, height=8, width=8, steps=10, guidance_scale=5.0,
    )
    assert z.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(z)).all()
    # CFG must differ from unguided
    z0 = latent_sample(
        pipe, lparams, jax.random.PRNGKey(0), ctx_c, None,
        batch_size=2, height=8, width=8, steps=10, guidance_scale=0.0,
    )
    assert float(jnp.abs(z - z0).max()) > 1e-5


def test_latent_sample_chunked_bitwise(ldm_unet):
    """Host-chained chunk dispatch (bench steady-state hook) must be
    bit-identical to the single-dispatch scan, including the PLMS history
    carry crossing chunk boundaries (7 steps / chunk 3 exercises a ragged
    final chunk)."""
    cfg, _, _ = ldm_unet
    pipe, lparams = _latent_pipe(ldm_unet)
    ctx_c = jnp.ones((1, 5, cfg.context_dim))
    ctx_u = jnp.zeros((1, 5, cfg.context_dim))
    for mode in ("ddim", "plms"):
        whole = latent_sample(
            pipe, lparams, jax.random.PRNGKey(3), ctx_c, ctx_u,
            batch_size=1, height=8, width=8, steps=7, guidance_scale=5.0,
            mode=mode,
        )
        times = []
        chunked = latent_sample(
            pipe, lparams, jax.random.PRNGKey(3), ctx_c, ctx_u,
            batch_size=1, height=8, width=8, steps=7, guidance_scale=5.0,
            mode=mode, max_steps_per_dispatch=3, chunk_times=times,
        )
        np.testing.assert_array_equal(np.asarray(whole), np.asarray(chunked))
        assert [n for n, _ in times] == [3, 3, 1]
        assert all(dt > 0 for _, dt in times)


def test_latent_sample_plms(ldm_unet):
    cfg, _, _ = ldm_unet
    pipe, lparams = _latent_pipe(ldm_unet)
    ctx = jnp.ones((1, 5, cfg.context_dim))
    z = latent_sample(
        pipe, lparams, jax.random.PRNGKey(1), ctx, None,
        batch_size=1, height=8, width=8, steps=10, mode="plms",
    )
    assert np.isfinite(np.asarray(z)).all()


def test_latent_inpainting_keeps_masked_region(ldm_unet):
    """mask=1 regions must stay (approximately) the init latent after
    sampling with eta=0."""
    cfg, _, _ = ldm_unet
    pipe, lparams = _latent_pipe(ldm_unet)
    ctx = jnp.ones((1, 5, cfg.context_dim))
    x0 = jnp.full((1, 8, 8, 4), 0.7)
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)
    z = latent_sample(
        pipe, lparams, jax.random.PRNGKey(2), ctx, None,
        batch_size=1, height=8, width=8, steps=10,
        x0_latent=x0, mask=mask,
    )
    # the final step re-pastes at t=1 where sqrt(alpha) ~ 1: kept region
    # should be close to x0 (up to one model step)
    kept = np.asarray(z[:, :4])
    assert np.abs(kept - 0.7).mean() < 0.3
    free = np.asarray(z[:, 4:])
    assert np.abs(free - 0.7).mean() > np.abs(kept - 0.7).mean()


def test_decode_latents_with_vq(vq, ldm_unet):
    vcfg, vmodel, vparams = vq
    pipe = LatentPipeline(
        unet_apply=None,
        decode=lambda p, z: vmodel.apply(p, z, method=VQModel.decode),
        encode=lambda p, x: vmodel.apply(p, x, method=VQModel.encode),
        downsample=2,
    )
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4))
    img = decode_latents(pipe, vparams, z)
    assert img.shape == (1, 32, 32, 3)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
