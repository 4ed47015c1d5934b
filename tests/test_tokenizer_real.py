"""Real-merge-table BPE path (VERDICT round-1 missing #6).

The production table (bpe_simple_vocab_16e6.txt.gz) is a deploy asset this
zero-egress environment can't fetch, so the REAL code path (SimpleTokenizer:
gzip merge file -> vocab construction -> greedy rank-ordered BPE with </w>
end-of-word markers) is exercised with a synthetic merge table written in
the exact file format, and cross-checked against `transformers.CLIPTokenizer`
— an independent faithful reimplementation of the OpenAI CLIP tokenizer —
built from the same table."""

import gzip
import json

import numpy as np
import pytest

from clip_diffusion_tpu.models.clip.tokenizer import (
    CONTEXT_LENGTH,
    SimpleTokenizer,
    bytes_to_unicode,
)

MERGES = [
    ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
    ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>"),
    ("t", "h"), ("th", "e</w>"), ("a", "n"), ("an", "d</w>"),
    ("i", "n"), ("in", "g</w>"), ("p", "a"), ("pa", "int"),
    ("n", "t"), ("i", "nt"),
]


def _write_assets(tmp_path):
    # the gzip merge file: version header line + "a b" merge lines (the
    # production file's exact layout; SimpleTokenizer slices off line 0)
    bpe_path = tmp_path / "bpe_test_vocab.txt.gz"
    with gzip.open(bpe_path, "wt", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in MERGES))
    # matching vocab.json + merges.txt for the transformers oracle,
    # constructed with the same vocab layout SimpleTokenizer derives
    byte_tokens = list(bytes_to_unicode().values())
    vocab = byte_tokens + [t + "</w>" for t in byte_tokens]
    vocab += ["".join(m) for m in MERGES]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    vocab_path = tmp_path / "vocab.json"
    with open(vocab_path, "w", encoding="utf-8") as f:
        json.dump({t: i for i, t in enumerate(vocab)}, f)
    merges_path = tmp_path / "merges.txt"
    with open(merges_path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in MERGES))
    return str(bpe_path), str(vocab_path), str(merges_path)


TEXTS = [
    "hello world",
    "Hello,   WORLD!!",
    "the painting",
    "an int and a thing",
    "word's worth; can't",
    "hello hello hello",
    "née jalapeño 画",  # multi-byte utf-8 through the byte encoder
    "",
]


def test_simple_tokenizer_matches_transformers_oracle(tmp_path):
    transformers = pytest.importorskip("transformers")
    bpe_path, vocab_path, merges_path = _write_assets(tmp_path)

    ours = SimpleTokenizer(bpe_path)
    oracle = transformers.CLIPTokenizer(vocab_path, merges_path)
    for text in TEXTS:
        got = ours.encode(text)
        ref = oracle.encode(text, add_special_tokens=False)
        assert got == ref, f"mismatch on {text!r}: {got} vs {ref}"


def test_simple_tokenizer_hand_verified_merges(tmp_path):
    """Known-by-construction encodings: rank-ordered greedy merging with
    end-of-word markers."""
    bpe_path, _, _ = _write_assets(tmp_path)
    tok = SimpleTokenizer(bpe_path)
    enc = tok.encoder

    # "hello" fully merges: h+e, l+l, he+ll, hell+o</w>
    assert tok.encode("hello") == [enc["hello</w>"]]
    # "hell" stops at he+ll but last char carries </w>: he + l + l</w>
    assert tok.encode("hell") == [enc["he"], enc["l"], enc["l</w>"]]
    # unknown word falls back to byte tokens + trailing </w> variant
    assert tok.encode("xy") == [enc["x"], enc["y</w>"]]


def test_tokenize_uses_real_table_when_present(tmp_path, monkeypatch):
    """End-to-end: with CLIP_BPE_PATH set, `tokenize` rides the real BPE
    path (SOT/EOT bracketing, padding, truncation)."""
    import clip_diffusion_tpu.models.clip.tokenizer as T

    bpe_path, _, _ = _write_assets(tmp_path)
    monkeypatch.setenv("CLIP_BPE_PATH", bpe_path)
    T.get_tokenizer.cache_clear()
    try:
        out = T.tokenize(["hello world", "the " * 200])
        assert out.shape == (2, CONTEXT_LENGTH)
        assert out[0, 0] == T.SOT
        real = SimpleTokenizer(bpe_path)
        inner = real.encode("hello world")
        assert out[0, 1 : 1 + len(inner)].tolist() == inner
        assert out[0, 1 + len(inner)] == T.EOT
        assert (out[0, 2 + len(inner) :] == 0).all()
        # truncation pins EOT at the end
        assert out[1, -1] == T.EOT
        assert (out[1] != 0).all()
    finally:
        T.get_tokenizer.cache_clear()


def test_hash_fallback_still_default():
    """Without assets the fallback stays deterministic and in-range."""
    import clip_diffusion_tpu.models.clip.tokenizer as T

    a = T.tokenize(["a castle on a hill"])
    b = T.tokenize(["a castle on a hill"])
    np.testing.assert_array_equal(a, b)
    assert a.max() < T.VOCAB_SIZE
