"""Native Flax MarianMT: structure, generation, and parity vs the installed
`transformers` torch implementation (the oracle the reference actually runs,
reference prompt.py:12-16)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from clip_diffusion_tpu.models.marian import (
    MarianConfig,
    MarianMT,
    convert_marian,
    greedy_decode,
    marian_tokenize,
    sinusoidal_positions,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _hf_tiny():
    from transformers import MarianConfig as HFConfig
    from transformers import MarianMTModel

    cfg = MarianConfig.tiny(vocab=64)
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.num_heads,
        decoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.ffn_dim,
        decoder_ffn_dim=cfg.ffn_dim,
        max_position_embeddings=cfg.max_positions,
        activation_function="silu",
        scale_embedding=cfg.scale_embedding,
        pad_token_id=cfg.pad_token_id,
        eos_token_id=cfg.eos_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id,
        forced_eos_token_id=None,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        share_encoder_decoder_embeddings=True,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    hf = MarianMTModel(hf_cfg).eval()
    # random final_logits_bias exercises the conversion path (HF inits it 0)
    with torch.no_grad():
        hf.final_logits_bias.copy_(
            torch.randn_like(hf.final_logits_bias) * 0.1
        )
    return cfg, hf


@pytest.fixture(scope="module")
def tiny_pair():
    cfg, hf = _hf_tiny()
    model = MarianMT(cfg)
    params = convert_marian(hf.state_dict(), cfg)
    return cfg, hf, model, params


def test_sinusoid_table_matches_hf(tiny_pair):
    # read from the constructed model: HF only fills the sinusoid table in
    # _init_weights, not on standalone-module construction
    cfg, hf, _, _ = tiny_pair
    ours = sinusoidal_positions(cfg.max_positions, cfg.d_model)
    np.testing.assert_allclose(
        ours,
        hf.model.encoder.embed_positions.weight.detach().numpy(),
        atol=1e-5,
    )


def test_forward_logits_parity(tiny_pair):
    cfg, hf, model, params = tiny_pair
    rng = np.random.default_rng(0)
    src = rng.integers(1, cfg.vocab_size - 2, (2, 9)).astype(np.int32)
    src[:, -2:] = [cfg.eos_token_id, cfg.pad_token_id]  # eos + one pad
    tgt = rng.integers(1, cfg.vocab_size - 2, (2, 7)).astype(np.int32)
    tgt[:, 0] = cfg.decoder_start_token_id

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(src, dtype=torch.long),
            decoder_input_ids=torch.tensor(tgt, dtype=torch.long),
        ).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(src), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_greedy_decode_parity_stepwise(tiny_pair):
    """Our greedy loop against a manual HF greedy loop with identical
    semantics (argmax, pad suppressed as in the opus generation config)."""
    cfg, hf, model, params = tiny_pair
    rng = np.random.default_rng(1)
    src = rng.integers(1, cfg.vocab_size - 2, (2, 6)).astype(np.int32)
    src[:, -1] = cfg.eos_token_id
    max_len = 10

    # HF manual greedy
    dec = np.full((2, max_len + 1), cfg.pad_token_id, np.int64)
    dec[:, 0] = cfg.decoder_start_token_id
    done = np.zeros(2, bool)
    with torch.no_grad():
        for i in range(max_len):
            logits = hf(
                input_ids=torch.tensor(src, dtype=torch.long),
                decoder_input_ids=torch.tensor(dec[:, : i + 1]),
            ).logits[:, -1].numpy()
            logits[:, cfg.pad_token_id] = -np.inf
            nxt = logits.argmax(-1)
            nxt = np.where(done, cfg.pad_token_id, nxt)
            dec[:, i + 1] = nxt
            done |= nxt == cfg.eos_token_id

    got = np.asarray(greedy_decode(model, params, jnp.asarray(src), max_len))
    np.testing.assert_array_equal(got, dec[:, 1:])


def test_greedy_decode_shapes_and_termination():
    cfg = MarianConfig.tiny(vocab=32)
    model = MarianMT(cfg)
    src = jnp.asarray([[3, 4, 5, cfg.eos_token_id]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, src)
    out = np.asarray(greedy_decode(model, params, src, max_len=8))
    assert out.shape == (1, 8)
    # after an eos everything is pad
    row = out[0]
    if (row == cfg.eos_token_id).any():
        e = int(np.argmax(row == cfg.eos_token_id))
        assert (row[e + 1 :] == cfg.pad_token_id).all()


def test_tokenizer_fallback_shapes():
    ids = marian_tokenize(["你好 世界", "hello"], max_len=16)
    assert ids.shape == (2, 16)
    cfg = MarianConfig.opus_zh_en()
    assert (ids[0] == cfg.eos_token_id).any()
    assert ids.max() < cfg.vocab_size


def test_native_translation_chain(tiny_pair):
    """tokenize -> greedy_decode -> detokenize runs end to end (the chain
    text/zh.py's native gate executes once real assets are provisioned)."""
    cfg, _, model, params = tiny_pair
    ids = marian_tokenize(["你好 世界"], max_len=8, cfg=cfg)
    assert ids.max() < cfg.vocab_size
    out = greedy_decode(model, params, jnp.asarray(ids), max_len=8)
    from clip_diffusion_tpu.models.marian import marian_detokenize

    text = marian_detokenize(out[0], cfg)
    assert isinstance(text, str)
