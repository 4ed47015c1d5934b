"""LDM text conditioning: the "BERTEmbedder" transformer encoder.

The reference conditions the LDM through
`model.get_learned_conditioning([prompt])` (reference sample.py:398-408),
which runs CompVis's BERTEmbedder: a from-scratch 32-layer, 1280-wide
pre-LN transformer encoder (x-transformers TransformerWrapper) over
BERT-uncased token ids (vocab 30522, max 77 tokens), returning (B, 77,
1280) context for cross-attention.

Tokenization: WordPiece when a vocab file is available ($BERT_VOCAB_PATH or
data/bert-base-uncased-vocab.txt); deterministic hash fallback otherwise
(same pattern as the CLIP tokenizer in this zero-egress build env).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import warnings
from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BERT_VOCAB_SIZE = 30522
MAX_SEQ_LEN = 77
CLS, SEP, PAD, UNK = 101, 102, 0, 100


@dataclasses.dataclass(frozen=True)
class BERTConfig:
    """x-transformers TransformerWrapper(Encoder(dim=1280, depth=32))
    hyperparameters, exactly as CompVis's BERTEmbedder constructs it:
    heads and dim_head keep x-transformers' DEFAULTS (8 and 64), so the
    attention inner width is 512 regardless of n_embed — the real
    checkpoint's to_q is (1280, 512).  No padding mask: CompVis calls the
    wrapper without one, so PAD tokens attend like any other (kept for
    checkpoint-activation parity)."""

    n_embed: int = 1280
    n_layer: int = 32
    n_heads: int = 8
    dim_head: int = 64
    vocab_size: int = BERT_VOCAB_SIZE
    max_seq_len: int = MAX_SEQ_LEN
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def tiny() -> "BERTConfig":
        return BERTConfig(n_embed=64, n_layer=2, n_heads=2, dim_head=16,
                          dtype=jnp.float32)


class EncoderBlock(nn.Module):
    """One (attention, feed-forward) pre-norm pair — x-transformers
    AttentionLayers entries 2i (attn) and 2i+1 (ff).  qkv is fused into one
    Dense (the converter concatenates to_q/to_k/to_v kernels); gelu is
    exact (torch nn.GELU default), not tanh-approximated."""

    dim: int
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim_head
        inner = self.heads * d
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       name=name)
        y = ln("norm1")(x.astype(jnp.float32)).astype(x.dtype)
        qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype,
                       name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, t, _ = q.shape
        q = q.reshape(b, t, self.heads, d)
        k = k.reshape(b, t, self.heads, d)
        v = v.reshape(b, t, self.heads, d)
        logits = jnp.einsum(
            "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(d)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, t, inner)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="attn_out")(out)

        y = ln("norm2")(x.astype(jnp.float32)).astype(x.dtype)
        y = nn.Dense(self.dim * 4, dtype=self.dtype, name="ff_in")(y)
        y = nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(y)
        return x + y


class BERTEmbedder(nn.Module):
    cfg: BERTConfig

    @nn.compact
    def __call__(self, tokens):
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.n_embed, dtype=c.dtype,
                     name="token_emb")(tokens)
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02),
            (c.max_seq_len, c.n_embed), jnp.float32,
        )
        x = x + pos[None, : tokens.shape[1]].astype(x.dtype)
        block = nn.remat(EncoderBlock) if c.n_layer > 8 else EncoderBlock
        for i in range(c.n_layer):
            x = block(c.n_embed, c.n_heads, c.dim_head, c.dtype,
                      name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        )
        return x  # (B, T, D) float32 context


# --------------------------------------------------------------------------
# BERT WordPiece tokenizer (with hash fallback)
# --------------------------------------------------------------------------

def _vocab_path():
    cands = [
        os.environ.get("BERT_VOCAB_PATH"),
        os.path.join(os.path.dirname(__file__), "..", "..", "..", "data",
                     "bert-base-uncased-vocab.txt"),
    ]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


@functools.lru_cache()
def _load_vocab():
    path = _vocab_path()
    if path is None:
        return None
    with open(path, encoding="utf-8") as f:
        return {line.rstrip("\n"): i for i, line in enumerate(f)}


def _wordpiece(word: str, vocab) -> List[int]:
    ids = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            piece = word[start:end]
            if start > 0:
                piece = "##" + piece
            if piece in vocab:
                cur = vocab[piece]
                break
            end -= 1
        if cur is None:
            return [UNK]
        ids.append(cur)
        start = end
    return ids


def bert_tokenize(texts: Sequence[str] | str,
                  max_len: int = MAX_SEQ_LEN) -> np.ndarray:
    """Texts -> (N, 77) BERT-uncased ids, CLS/SEP-bracketed, zero-padded."""
    if isinstance(texts, str):
        texts = [texts]
    vocab = _load_vocab()
    if vocab is None:
        warnings.warn(
            "BERT vocab not found (set BERT_VOCAB_PATH or place "
            "bert-base-uncased-vocab.txt under data/); using a deterministic "
            "hash tokenizer stand-in."
        )
    out = np.zeros((len(texts), max_len), dtype=np.int32)
    for i, text in enumerate(texts):
        words = text.lower().split()
        ids: List[int] = [CLS]
        for wd in words:
            if vocab is not None:
                ids.extend(_wordpiece(wd, vocab))
            else:
                h = 0
                for ch in wd.encode("utf-8"):
                    h = (h * 131 + ch) % (BERT_VOCAB_SIZE - 1000)
                ids.append(1000 + h)
        ids = ids[: max_len - 1] + [SEP]
        out[i, : len(ids)] = ids
    return out
