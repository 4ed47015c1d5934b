"""Sentence-T5 text encoder in Flax.

The reference embeds prompts with sentence-transformers/sentence-t5-base to
retrieve modifier keywords (reference prompt.py:18-20,55-68,
models.py:177-185).  sentence-t5 = the T5 encoder stack + mean pooling over
non-pad tokens + a linear projection + L2 normalization.

T5 encoder specifics reproduced for checkpoint parity: RMSNorm (no bias,
pre-norm), relative-position bucket bias on the first layer's attention
(shared across layers), ReLU feed-forward (t5-base v1.0), no attention
scaling (T5 bakes 1/sqrt(d) into initialization), tied relative embeddings.

Tokenizer: T5 uses SentencePiece (model file required).  As with
CLIP/BERT, a hash fallback keeps shapes testable in zero-egress
environments; real retrieval quality needs the .model file
($T5_SPM_PATH) or precomputed keyword embeddings (tools/build_banks.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import warnings
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

T5_VOCAB = 32128


@dataclasses.dataclass(frozen=True)
class T5Config:
    d_model: int = 768
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    d_kv: int = 64
    vocab_size: int = T5_VOCAB
    rel_buckets: int = 32
    rel_max_distance: int = 128
    projection_dim: int = 768  # sentence-t5 output dim
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def tiny() -> "T5Config":
        return T5Config(d_model=32, d_ff=64, num_layers=2, num_heads=2,
                        d_kv=16, projection_dim=16)


class RMSNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(x**2, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + 1e-6)
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        return (x * scale).astype(orig)


def _relative_position_bucket(rel, num_buckets=32, max_distance=128):
    """T5 bidirectional relative-position bucketing."""
    num_buckets //= 2
    ret = (rel > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, rel_bias=None):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        b, t, _ = x.shape
        q = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="v")(x)
        q = q.reshape(b, t, c.num_heads, c.d_kv)
        k = k.reshape(b, t, c.num_heads, c.d_kv)
        v = v.reshape(b, t, c.num_heads, c.d_kv)
        # T5: no 1/sqrt(d) scaling
        logits = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        if self.has_rel_bias:
            pos = jnp.arange(t)
            rel = pos[None, :] - pos[:, None]  # (t, t) key - query
            buckets = _relative_position_bucket(
                rel, c.rel_buckets, c.rel_max_distance
            )
            table = self.param(
                "rel_bias", nn.initializers.normal(0.02),
                (c.rel_buckets, c.num_heads), jnp.float32,
            )
            rel_bias = table[buckets].transpose(2, 0, 1)[None]  # (1,h,t,t)
        if rel_bias is not None:
            logits = logits + rel_bias
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, t, inner)
        out = nn.Dense(c.d_model, use_bias=False, dtype=c.dtype, name="o")(out)
        return out, rel_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, rel_bias):
        c = self.cfg
        y, rel_bias = T5Attention(c, self.has_rel_bias, name="attn")(
            RMSNorm(name="ln1")(x), mask, rel_bias
        )
        x = x + y
        h = RMSNorm(name="ln2")(x)
        h = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi")(h)
        h = nn.relu(h)
        h = nn.Dense(c.d_model, use_bias=False, dtype=c.dtype, name="wo")(h)
        return x + h, rel_bias


class SentenceT5(nn.Module):
    """tokens (B, T) -> L2-normalized sentence embeddings (B, proj_dim)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, tokens):
        c = self.cfg
        mask = tokens != 0  # T5 pad id 0
        x = nn.Embed(c.vocab_size, c.d_model, dtype=c.dtype, name="shared")(
            tokens
        )
        rel_bias = None
        for i in range(c.num_layers):
            x, rel_bias = T5Block(c, has_rel_bias=(i == 0),
                                  name=f"block_{i}")(x, mask, rel_bias)
        x = RMSNorm(name="final_ln")(x)
        # mean pooling over non-pad tokens (sentence-transformers pooling)
        denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1)
        pooled = (x * mask[..., None]).sum(axis=1) / denom
        proj = nn.Dense(c.projection_dim, use_bias=False, dtype=c.dtype,
                        name="projection")(pooled)
        norm = jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True),
                           1e-12)
        return (proj / norm).astype(jnp.float32)


def load_or_init_sentence_t5(param_dtype=jnp.float32, seed: int = 0):
    """(SentenceT5, params): converted sentence-t5-base weights from
    $T5_PARAMS_PATH (default data/t5/params, written by
    tools/fetch_and_convert.py --t5) when provisioned, else a deterministic
    random init (seeded — fine for wiring tests, meaningless for retrieval
    quality).  The single constructor both the prompt front end and
    tools/build_banks.py use, so query and bank embeddings always share one
    tower."""
    import jax

    model = SentenceT5(T5Config())
    path = os.environ.get("T5_PARAMS_PATH", "data/t5/params")
    if os.path.isdir(path):
        from clip_diffusion_tpu.utils.checkpoint import load_params

        return model, load_params(path)

    from clip_diffusion_tpu.zoo import _host_init

    params = _host_init(
        lambda: model.init(
            jax.random.PRNGKey(seed), jnp.ones((1, 64), jnp.int32)
        ),
        param_dtype=param_dtype, seed=seed,
    )
    return model, params


# --------------------------------------------------------------------------
# tokenizer (SentencePiece when available; hash fallback)
# --------------------------------------------------------------------------

@functools.lru_cache()
def _spm():
    path = os.environ.get("T5_SPM_PATH") or os.path.join(
        os.path.dirname(__file__), "..", "..", "data", "t5-spiece.model"
    )
    if not os.path.exists(path):
        return None
    try:
        import sentencepiece as sp

        proc = sp.SentencePieceProcessor()
        proc.Load(path)
        return proc
    except ImportError:
        # native pure-Python unigram runtime (text/spm.py) — the asset is
        # enough; the sentencepiece wheel is optional
        from clip_diffusion_tpu.text.spm import load_unigram

        return load_unigram(path)


def t5_tokenize(texts: Sequence[str] | str, max_len: int = 64) -> np.ndarray:
    if isinstance(texts, str):
        texts = [texts]
    proc = _spm()
    if proc is None:
        warnings.warn(
            "T5 SentencePiece model unavailable; using a deterministic hash "
            "tokenizer stand-in (set T5_SPM_PATH for the real vocabulary)."
        )
    out = np.zeros((len(texts), max_len), np.int32)
    for i, text in enumerate(texts):
        if proc is not None:
            ids = proc.EncodeAsIds(text)[: max_len - 1]
        else:
            ids = []
            for wd in text.lower().split():
                h = 0
                for ch in wd.encode():
                    h = (h * 131 + ch) % (T5_VOCAB - 1000)
                ids.append(1000 + h)
            ids = ids[: max_len - 1]
        ids = ids + [1]  # </s>
        out[i, : len(ids)] = ids
    return out


def convert_sentence_t5(state_dict) -> dict:
    """HF T5EncoderModel (+ sentence-transformers dense) -> flax params.

    Keys: shared.weight; encoder.block.N.layer.0.SelfAttention.{q,k,v,o}.
    weight; ...relative_attention_bias.weight (block 0);
    encoder.block.N.layer.{0,1}.layer_norm.weight; encoder.block.N.layer.1.
    DenseReluDense.{wi,wo}.weight; encoder.final_layer_norm.weight; and the
    sentence-transformers '2_Dense/linear.weight' projection."""
    from clip_diffusion_tpu.models.convert import _np, _set, linear_kernel

    params: dict = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        if key == "shared.weight":
            _set(params, ("shared", "embedding"), _np(val))
        elif key == "encoder.final_layer_norm.weight":
            _set(params, ("final_ln", "weight"), _np(val))
        elif key.startswith("encoder.block."):
            n = parts[2]
            block = f"block_{n}"
            if parts[4] == "0":  # attention sublayer
                if parts[5] == "SelfAttention":
                    if parts[6] == "relative_attention_bias":
                        _set(params, (block, "attn", "rel_bias"), _np(val))
                    else:
                        _set(params, (block, "attn", parts[6], "kernel"),
                             linear_kernel(val))
                else:  # layer_norm
                    _set(params, (block, "ln1", "weight"), _np(val))
            else:  # ff sublayer
                if parts[5] == "DenseReluDense":
                    _set(params, (block, parts[6], "kernel"),
                         linear_kernel(val))
                else:
                    _set(params, (block, "ln2", "weight"), _np(val))
        elif "linear.weight" in key or key == "projection.weight":
            _set(params, ("projection", "kernel"), linear_kernel(val))
        else:
            raise KeyError(f"unmapped sentence-t5 key: {key}")
    return {"params": params}
