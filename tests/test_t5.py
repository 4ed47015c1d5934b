import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.models.t5 import (
    SentenceT5,
    T5Config,
    _relative_position_bucket,
    convert_sentence_t5,
    t5_tokenize,
)


@pytest.fixture(scope="module")
def tiny_t5():
    cfg = T5Config.tiny()
    model = SentenceT5(cfg)
    toks = jnp.asarray(t5_tokenize(["a test"]))
    params = model.init(jax.random.PRNGKey(0), toks)
    return cfg, model, params


def test_t5_tokenize_shapes():
    toks = t5_tokenize(["a cute dog", "hello world"])
    assert toks.shape == (2, 64)
    for row in toks:
        nz = row[row > 0]
        assert nz[-1] == 1  # </s>


def test_sentence_embedding_normalized(tiny_t5):
    cfg, model, params = tiny_t5
    toks = jnp.asarray(t5_tokenize(["a castle on a hill", "the same castle"]))
    emb = model.apply(params, toks)
    assert emb.shape == (2, cfg.projection_dim)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(emb, axis=-1)), 1.0, atol=1e-5
    )


def test_padding_invariance(tiny_t5):
    """Extra pad tokens must not change the embedding (masked attention +
    masked mean pooling)."""
    cfg, model, params = tiny_t5
    t1 = t5_tokenize(["a dog"], max_len=16)
    t2 = t5_tokenize(["a dog"], max_len=64)
    e1 = model.apply(params, jnp.asarray(t1))
    e2 = model.apply(params, jnp.asarray(t2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_relative_position_buckets():
    rel = jnp.asarray([[-64, -1, 0, 1, 64]])
    b = np.asarray(_relative_position_bucket(rel))
    assert b.shape == (1, 5)
    assert b[0, 2] == 0  # zero distance -> bucket 0
    assert b[0, 3] >= 16  # positive side offset by num_buckets//2
    assert (b >= 0).all() and (b < 32).all()


def test_flagship_param_count():
    cfg = T5Config()
    model = SentenceT5(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.ones((1, 64), jnp.int32))
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes))
    # t5-base encoder ~110M + projection
    assert 100e6 < n < 125e6, f"{n/1e6:.1f}M"


def test_converter_structure(tiny_t5):
    cfg, model, template = tiny_t5
    rng = np.random.default_rng(0)
    d, ff, kv, h = cfg.d_model, cfg.d_ff, cfg.d_kv, cfg.num_heads
    sd = {"shared.weight": rng.normal(size=(cfg.vocab_size, d)).astype("f"),
          "encoder.final_layer_norm.weight": np.ones(d, "f"),
          "2_Dense.linear.weight": rng.normal(
              size=(cfg.projection_dim, d)).astype("f")}
    for n in range(cfg.num_layers):
        b = f"encoder.block.{n}"
        for m in ("q", "k", "v"):
            sd[f"{b}.layer.0.SelfAttention.{m}.weight"] = rng.normal(
                size=(h * kv, d)).astype("f")
        sd[f"{b}.layer.0.SelfAttention.o.weight"] = rng.normal(
            size=(d, h * kv)).astype("f")
        if n == 0:
            sd[f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"] = (
                rng.normal(size=(cfg.rel_buckets, h)).astype("f"))
        sd[f"{b}.layer.0.layer_norm.weight"] = np.ones(d, "f")
        sd[f"{b}.layer.1.DenseReluDense.wi.weight"] = rng.normal(
            size=(ff, d)).astype("f")
        sd[f"{b}.layer.1.DenseReluDense.wo.weight"] = rng.normal(
            size=(d, ff)).astype("f")
        sd[f"{b}.layer.1.layer_norm.weight"] = np.ones(d, "f")

    from clip_diffusion_tpu.models.convert import validate_against

    converted = convert_sentence_t5(sd)
    problems = validate_against(template, converted)
    assert not problems, problems[:10]
