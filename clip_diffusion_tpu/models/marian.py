"""MarianMT zh->en translation model in Flax.

The reference translates Chinese prompts with the HF pipeline around
`Helsinki-NLP/opus-mt-zh-en` (reference prompt.py:12-16,41-53).  This module
natively reimplements the Marian encoder-decoder so translation runs inside
the framework (no torch at serving time):

* post-norm transformer (residual -> add -> LayerNorm), the Marian layout;
* sinusoidal position table with sin in the first half of the feature dim
  and cos in the second (Marian's non-interleaved variant), NOT learned —
  regenerated, never loaded from checkpoints;
* shared source/target token embedding, also reused (transposed) as the
  output projection, plus the `final_logits_bias` vector;
* embeddings scaled by sqrt(d_model) (opus models set scale_embedding);
* SiLU ("swish") feed-forward activation for opus-mt checkpoints.

Greedy decoding runs as a `lax.fori_loop` over a fixed-size token buffer —
static shapes, one compiled program for any prompt (the sequence cap is 64
tokens, so recomputing the small decoder per emitted token costs far less
than maintaining a KV cache would save).

Checkpoints: `convert_marian` maps the HF torch state dict; the tokenizer is
SentencePiece (deploy asset, hash fallback for CI like CLIP/T5/BERT).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import warnings
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MarianConfig:
    vocab_size: int = 65001
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    max_positions: int = 512
    activation: str = "silu"  # opus-mt "swish"
    scale_embedding: bool = True
    pad_token_id: int = 65000
    eos_token_id: int = 0
    decoder_start_token_id: int = 65000
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def opus_zh_en() -> "MarianConfig":
        """Helsinki-NLP/opus-mt-zh-en geometry."""
        return MarianConfig()

    @staticmethod
    def tiny(vocab: int = 64) -> "MarianConfig":
        return MarianConfig(
            vocab_size=vocab, d_model=16, encoder_layers=2, decoder_layers=2,
            num_heads=2, ffn_dim=32, max_positions=64,
            pad_token_id=vocab - 1, decoder_start_token_id=vocab - 1,
            eos_token_id=0,
        )


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    """Marian's non-interleaved sinusoid table: [sin(angles) | cos(angles)]
    with angle_k = pos / 10000^(2k/dim)."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    k = np.arange(dim // 2, dtype=np.float64)[None, :]
    angles = pos / np.power(10000.0, 2.0 * k / dim)
    table = np.concatenate([np.sin(angles), np.cos(angles)], axis=-1)
    if dim % 2:  # odd dims get one extra sin column in HF; keep shape
        table = np.pad(table, ((0, 0), (0, 1)))
    return table.astype(np.float32)


_ACT = {"silu": nn.silu, "swish": nn.silu, "gelu": nn.gelu, "relu": nn.relu}


class MarianAttention(nn.Module):
    cfg: MarianConfig

    @nn.compact
    def __call__(self, x, kv, bias):
        """bias: additive attention bias broadcastable to (B, H, Lq, Lk)."""
        c = self.cfg
        h, hd = c.num_heads, c.d_model // c.num_heads
        dense = functools.partial(nn.Dense, c.d_model, dtype=c.dtype)
        # Marian scales q before the score matmul
        q = dense(name="q_proj")(x) * (hd**-0.5)
        k = dense(name="k_proj")(kv)
        v = dense(name="v_proj")(kv)

        def split(t):
            return t.reshape(t.shape[:-1] + (h, hd)).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) + bias
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(c.dtype), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[:-1] + (c.d_model,))
        return dense(name="out_proj")(out)


class MarianFFN(nn.Module):
    cfg: MarianConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Dense(c.ffn_dim, dtype=c.dtype, name="fc1")(x)
        x = _ACT[c.activation](x)
        return nn.Dense(c.d_model, dtype=c.dtype, name="fc2")(x)


class MarianEncoderLayer(nn.Module):
    cfg: MarianConfig

    @nn.compact
    def __call__(self, x, bias):
        ln = functools.partial(nn.LayerNorm, epsilon=1e-5, dtype=self.cfg.dtype)
        x = ln(name="self_attn_layer_norm")(
            x + MarianAttention(self.cfg, name="self_attn")(x, x, bias)
        )
        return ln(name="final_layer_norm")(
            x + MarianFFN(self.cfg, name="ffn")(x)
        )


class MarianDecoderLayer(nn.Module):
    cfg: MarianConfig

    @nn.compact
    def __call__(self, x, enc, self_bias, cross_bias):
        ln = functools.partial(nn.LayerNorm, epsilon=1e-5, dtype=self.cfg.dtype)
        x = ln(name="self_attn_layer_norm")(
            x + MarianAttention(self.cfg, name="self_attn")(x, x, self_bias)
        )
        x = ln(name="encoder_attn_layer_norm")(
            x + MarianAttention(self.cfg, name="encoder_attn")(x, enc, cross_bias)
        )
        return ln(name="final_layer_norm")(
            x + MarianFFN(self.cfg, name="ffn")(x)
        )


def _pad_bias(valid_mask, dtype):
    """(B, Lk) key validity -> (B, 1, 1, Lk) additive bias."""
    return jnp.where(valid_mask, 0.0, -1e9).astype(dtype)[:, None, None, :]


class MarianMT(nn.Module):
    """Full encoder-decoder.  `__call__(src, tgt) -> logits` teacher-forced;
    `encode`/`decode` expose the halves for generation."""

    cfg: MarianConfig

    def setup(self):
        c = self.cfg
        self.shared = nn.Embed(
            c.vocab_size, c.d_model, dtype=c.dtype, name="shared"
        )
        self.pos_table = jnp.asarray(
            sinusoidal_positions(c.max_positions, c.d_model)
        )
        self.enc_layers = [
            MarianEncoderLayer(c, name=f"enc_{i}")
            for i in range(c.encoder_layers)
        ]
        self.dec_layers = [
            MarianDecoderLayer(c, name=f"dec_{i}")
            for i in range(c.decoder_layers)
        ]
        self.final_logits_bias = self.param(
            "final_logits_bias", nn.initializers.zeros, (c.vocab_size,)
        )

    def _embed(self, ids):
        c = self.cfg
        scale = float(np.sqrt(c.d_model)) if c.scale_embedding else 1.0
        x = self.shared(ids) * scale
        return x + self.pos_table[None, : ids.shape[1]].astype(c.dtype)

    def encode(self, src_ids):
        """(B, Ls) -> (B, Ls, D).  Source pad tokens are masked out of
        attention keys; their output rows are junk and must stay masked in
        cross-attention (decode does this)."""
        bias = _pad_bias(src_ids != self.cfg.pad_token_id, self.cfg.dtype)
        x = self._embed(src_ids)
        for layer in self.enc_layers:
            x = layer(x, bias)
        return x

    def decode(self, tgt_ids, enc_out, src_ids):
        """Teacher-forced decoder: (B, Lt) token prefix -> (B, Lt, V)
        logits.  Causal self-attention; cross-attention masks source pads."""
        c = self.cfg
        lt = tgt_ids.shape[1]
        causal = jnp.where(
            jnp.tril(jnp.ones((lt, lt), bool)), 0.0, -1e9
        ).astype(c.dtype)[None, None]
        cross = _pad_bias(src_ids != c.pad_token_id, c.dtype)
        x = self._embed(tgt_ids)
        for layer in self.dec_layers:
            x = layer(x, enc_out, causal, cross)
        logits = self.shared.attend(x)  # tied output projection
        return logits + self.final_logits_bias

    def __call__(self, src_ids, tgt_ids):
        return self.decode(tgt_ids, self.encode(src_ids), src_ids)


@functools.lru_cache(maxsize=None)
def _jit_greedy(model: MarianMT, max_len: int, suppress_pad: bool):
    c = model.cfg

    def impl(params, src_ids):
        b = src_ids.shape[0]
        enc_out = model.apply(params, src_ids, method=MarianMT.encode)
        buf = jnp.full((b, max_len + 1), c.pad_token_id, jnp.int32)
        buf = buf.at[:, 0].set(c.decoder_start_token_id)
        done0 = jnp.zeros((b,), bool)

        def step(i, carry):
            buf, done = carry
            logits = model.apply(
                params, buf, enc_out, src_ids, method=MarianMT.decode
            )  # (B, L+1, V)
            row = logits[:, i]
            if suppress_pad:
                row = row.at[:, c.pad_token_id].set(-jnp.inf)
            nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, c.pad_token_id, nxt)
            buf = buf.at[:, i + 1].set(nxt)
            return buf, done | (nxt == c.eos_token_id)

        buf, _ = jax.lax.fori_loop(0, max_len, step, (buf, done0))
        return buf[:, 1:]

    return jax.jit(impl)


def greedy_decode(
    model: MarianMT,
    params,
    src_ids,
    max_len: int = 64,
    suppress_pad: bool = True,
):
    """Batch greedy generation: (B, Ls) -> (B, max_len) generated ids
    (eos-terminated, pad-filled).  ONE jitted program per (model, max_len)
    — cached, since this runs eagerly per translation request and an
    un-jitted encode would dispatch op-by-op (marian_tokenize pads sources
    to a fixed length, so the program compiles once): fixed token buffer,
    `lax.fori_loop`, full (small) decoder recompute per emitted token.

    `suppress_pad` mirrors the opus generation config's bad_words_ids
    [[pad]] — the pad logit is floored so argmax can't emit it."""
    # the decode buffer is max_len+1 tokens; the sinusoid table caps it
    max_len = min(max_len, model.cfg.max_positions - 1)
    return _jit_greedy(model, max_len, suppress_pad)(params, src_ids)


# --------------------------------------------------------------------------
# Tokenizer (SentencePiece deploy asset; hash fallback for CI)
# --------------------------------------------------------------------------

@functools.lru_cache()
def _assets():
    """(spm processor, vocab dict) when the real deploy assets exist.

    HF MarianTokenizer pairs a source SentencePiece model with a shared
    vocab.json (piece -> id); raw spm ids are NOT the model ids.  Assets:
    $MARIAN_SPM_PATH (source.spm) + $MARIAN_VOCAB_PATH (vocab.json),
    defaulting to data/marian/."""
    spm_path = os.environ.get("MARIAN_SPM_PATH", "data/marian/source.spm")
    vocab_path = os.environ.get("MARIAN_VOCAB_PATH", "data/marian/vocab.json")
    if os.path.exists(spm_path) and os.path.exists(vocab_path):
        try:
            import json

            try:
                import sentencepiece as sp

                proc = sp.SentencePieceProcessor()
                proc.Load(spm_path)
            except ImportError:
                # native pure-Python unigram runtime (text/spm.py)
                from clip_diffusion_tpu.text.spm import load_unigram

                proc = load_unigram(spm_path)
            with open(vocab_path, encoding="utf-8") as f:
                vocab = json.load(f)
            return proc, vocab
        except Exception as e:  # pragma: no cover - asset/dep problem
            warnings.warn(f"failed to load Marian tokenizer assets: {e}")
    return None, None


def marian_tokenize(
    texts: Sequence[str] | str,
    max_len: int = 64,
    cfg: Optional[MarianConfig] = None,
) -> np.ndarray:
    """Source tokenization: SPM pieces mapped through vocab.json + eos,
    right-padded.  Without the assets a deterministic hash stand-in keeps
    shapes testable (wrong for real checkpoints, as with the CLIP/BERT/T5
    fallbacks)."""
    cfg = cfg or MarianConfig.opus_zh_en()
    if isinstance(texts, str):
        texts = [texts]
    out = np.full((len(texts), max_len), cfg.pad_token_id, np.int32)
    proc, vocab = _assets()
    unk = (vocab or {}).get("<unk>", 1)
    for i, text in enumerate(texts):
        if proc is not None:
            ids = [vocab.get(p, unk) for p in proc.EncodeAsPieces(text)]
        else:
            if not getattr(marian_tokenize, "_warned", False):
                warnings.warn(
                    "Marian tokenizer assets not found (set MARIAN_SPM_PATH "
                    "+ MARIAN_VOCAB_PATH); using a deterministic hash "
                    "stand-in."
                )
                marian_tokenize._warned = True
            # stable rolling hash (NOT builtin hash(): that is salted per
            # process, same pattern as the CLIP/T5 fallbacks)
            ids = []
            for tok in text.lower().split():
                h = 0
                for ch in tok.encode("utf-8"):
                    h = (h * 131 + ch) % (cfg.vocab_size - 2)
                ids.append(h + 1)
        ids = ids[: max_len - 1] + [cfg.eos_token_id]
        out[i, : len(ids)] = ids
    return out


def marian_detokenize(ids, cfg: Optional[MarianConfig] = None) -> str:
    """Generated id row -> text (stops at eos, skips pad; SentencePiece
    `▁` word-boundary convention)."""
    cfg = cfg or MarianConfig.opus_zh_en()
    _, vocab = _assets()
    if vocab is None:
        return " ".join(
            f"<{int(i)}>" for i in np.asarray(ids)
            if int(i) not in (cfg.pad_token_id, cfg.eos_token_id)
        )
    inv = {v: k for k, v in vocab.items()}
    pieces = []
    for i in np.asarray(ids):
        i = int(i)
        if i == cfg.eos_token_id:
            break
        if i == cfg.pad_token_id:
            continue
        pieces.append(inv.get(i, "<unk>"))
    return "".join(pieces).replace("▁", " ").strip()


# --------------------------------------------------------------------------
# HF torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_marian(state_dict, cfg: Optional[MarianConfig] = None) -> dict:
    """HF MarianMTModel state dict -> flax params for MarianMT.

    Key layout (HF): model.shared.weight; model.{encoder,decoder}.layers.N.
    {self_attn,encoder_attn}.{q,k,v,out}_proj.{weight,bias};
    *_layer_norm.{weight,bias}; fc1/fc2; final_logits_bias.  Position
    embeddings are deterministic sinusoids — regenerated, not copied."""
    cfg = cfg or MarianConfig.opus_zh_en()

    def t(name):
        arr = state_dict[name]
        arr = arr.detach().cpu().numpy() if hasattr(arr, "detach") else np.asarray(arr)
        return jnp.asarray(arr, jnp.float32)

    def dense(prefix):
        return {"kernel": t(f"{prefix}.weight").T, "bias": t(f"{prefix}.bias")}

    def lnorm(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    def attn(prefix):
        return {p: dense(f"{prefix}.{p}") for p in
                ("q_proj", "k_proj", "v_proj", "out_proj")}

    params = {
        "shared": {"embedding": t("model.shared.weight")},
        "final_logits_bias": t("final_logits_bias").reshape(-1),
    }
    for side, n, mk in (
        ("encoder", cfg.encoder_layers, "enc"),
        ("decoder", cfg.decoder_layers, "dec"),
    ):
        for i in range(n):
            hp = f"model.{side}.layers.{i}"
            layer = {
                "self_attn": attn(f"{hp}.self_attn"),
                "self_attn_layer_norm": lnorm(f"{hp}.self_attn_layer_norm"),
                "ffn": {"fc1": dense(f"{hp}.fc1"), "fc2": dense(f"{hp}.fc2")},
                "final_layer_norm": lnorm(f"{hp}.final_layer_norm"),
            }
            if side == "decoder":
                layer["encoder_attn"] = attn(f"{hp}.encoder_attn")
                layer["encoder_attn_layer_norm"] = lnorm(
                    f"{hp}.encoder_attn_layer_norm"
                )
            params[f"{mk}_{i}"] = layer
    return {"params": params}
