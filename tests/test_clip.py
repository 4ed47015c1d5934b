import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.models.clip.model import (
    CLIP_PRESETS,
    CLIPModel,
    clip_normalize,
    tiny_clip_config,
)
from clip_diffusion_tpu.models.clip.tokenizer import (
    CONTEXT_LENGTH,
    EOT,
    SOT,
    VOCAB_SIZE,
    HashTokenizer,
    bytes_to_unicode,
    tokenize,
)


# ---------------- tokenizer ----------------

def test_tokenize_shape_and_brackets():
    toks = tokenize(["a cute golden retriever", "hello"])
    assert toks.shape == (2, CONTEXT_LENGTH)
    assert toks.dtype == np.int32
    assert (toks[:, 0] == SOT).all()
    for row in toks:
        nz = row[row > 0]
        assert nz[-1] == EOT
        assert (row < VOCAB_SIZE).all()


def test_tokenize_deterministic_and_case_insensitive():
    a = tokenize("A Cute DOG")
    b = tokenize("a cute dog")
    np.testing.assert_array_equal(a, b)


def test_tokenize_truncates():
    toks = tokenize("word " * 200)
    assert toks.shape == (1, CONTEXT_LENGTH)
    assert toks[0, -1] == EOT


def test_bytes_to_unicode_bijective():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_hash_tokenizer_stable():
    t = HashTokenizer()
    assert t.encode("dog") == t.encode("dog")
    assert t.encode("dog") != t.encode("cat")


# ---------------- model ----------------

@pytest.fixture(scope="module")
def vit():
    cfg = tiny_clip_config()
    model = CLIPModel(cfg)
    imgs = jnp.ones((1, cfg.image_resolution, cfg.image_resolution, 3))
    toks = jnp.asarray(tokenize(["test"]))
    params = model.init(jax.random.PRNGKey(0), imgs, toks)
    return cfg, model, params


def test_vit_encode_image(vit):
    cfg, model, params = vit
    imgs = clip_normalize(
        jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32, 3))
    )
    emb = model.apply(params, imgs, method=CLIPModel.encode_image)
    assert emb.shape == (3, cfg.embed_dim)
    assert emb.dtype == jnp.float32
    assert np.isfinite(np.asarray(emb)).all()


def test_vit_encode_text(vit):
    cfg, model, params = vit
    toks = jnp.asarray(tokenize(["a dog", "a cat sitting on a mat"]))
    emb = model.apply(params, toks, method=CLIPModel.encode_text)
    assert emb.shape == (2, cfg.embed_dim)
    # different texts -> different embeddings
    assert float(jnp.abs(emb[0] - emb[1]).max()) > 1e-5


def test_text_eot_pooling_ignores_padding(vit):
    """Tokens after EOT (padding) must not affect the embedding (causal mask
    + EOT pooling)."""
    cfg, model, params = vit
    toks = np.asarray(tokenize(["a dog"]))
    toks2 = toks.copy()
    # poison a padding position after EOT
    eot_pos = int(np.argmax(toks[0]))
    toks2[0, eot_pos + 2] = 123
    e1 = model.apply(params, jnp.asarray(toks), method=CLIPModel.encode_text)
    e2 = model.apply(params, jnp.asarray(toks2), method=CLIPModel.encode_text)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_image_grad_flows(vit):
    cfg, model, params = vit

    def f(x):
        return jnp.sum(model.apply(params, x, method=CLIPModel.encode_image) ** 2)

    g = jax.grad(f)(jnp.ones((1, 32, 32, 3)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_resnet_tower():
    cfg = tiny_clip_config(resnet=True)
    model = CLIPModel(cfg)
    imgs = jnp.ones((1, 64, 64, 3))
    toks = jnp.asarray(tokenize(["x"]))
    params = model.init(jax.random.PRNGKey(0), imgs, toks)
    emb = model.apply(params, imgs, method=CLIPModel.encode_image)
    assert emb.shape == (1, cfg.embed_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_preset_structures():
    """Flagship presets produce the reference embedding widths via
    shape-only init (no weight materialization)."""
    for name, dim in [("ViT-B/32", 512), ("ViT-L/14", 768), ("RN101", 512),
                      ("RN50", 1024)]:
        cfg = CLIP_PRESETS[name]
        assert cfg.embed_dim == dim
        assert cfg.image_resolution == 224

    cfg = CLIP_PRESETS["ViT-B/32"]
    model = CLIPModel(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, 224, 224, 3)),
            jnp.ones((1, 77), jnp.int32),
        )
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes))
    # OpenAI ViT-B/32 has ~151.3M params
    assert 145e6 < n < 158e6, f"{n/1e6:.1f}M"


def test_clip_normalize():
    x = jnp.zeros((1, 2, 2, 3))
    out = np.asarray(clip_normalize(x))
    np.testing.assert_allclose(out[0, 0, 0], [-1.7923, -1.7521, -1.4802],
                               atol=1e-3)


def test_bf16_attention_close_to_f32():
    """Production towers run bf16 attention logits (models/clip/model.py
    MultiheadAttention); embeddings must stay within ~1% of the f32 path
    (the reference's checkpoints run fp16 attention under torch .half())."""
    import dataclasses

    cfg32 = tiny_clip_config("bf16check")
    m32 = CLIPModel(cfg32)
    params = m32.init(
        jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)),
        jnp.ones((1, 77), jnp.int32),
    )
    img = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    e32 = np.asarray(m32.apply(params, img, method=CLIPModel.encode_image))
    m16 = CLIPModel(dataclasses.replace(cfg32, dtype=jnp.bfloat16))
    e16 = np.asarray(
        m16.apply(params, img, method=CLIPModel.encode_image), np.float32
    )
    rel = np.linalg.norm(e16 - e32) / np.linalg.norm(e32)
    assert rel < 0.02, rel
