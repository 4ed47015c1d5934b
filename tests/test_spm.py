"""Pure-Python SentencePiece unigram runtime (text/spm.py).

Parity oracle: the HF `tokenizers` Rust Unigram model — same vocab, same
strings, identical ids (the pattern test_tokenizer_real.py uses for the
CLIP BPE path).  Plus real-format fixture assets driving the T5 and Marian
tokenizers' non-hash paths end to end (VERDICT r2 item 6).
"""

import json
import warnings

import numpy as np
import pytest

from clip_diffusion_tpu.text import spm


def _fixture_pieces():
    """A tiny unigram vocab in T5 layout: pad=0, </s>=1, <unk>=2."""
    pieces = [
        ("<pad>", 0.0, spm.CONTROL),
        ("</s>", 0.0, spm.CONTROL),
        ("<unk>", 0.0, spm.UNKNOWN),
    ]
    words = [
        ("▁a", -3.0), ("▁the", -3.2), ("▁painting", -5.0), ("▁paint", -5.5),
        ("ing", -2.5), ("▁oil", -4.0), ("▁of", -3.1), ("▁landscape", -6.0),
        ("▁land", -5.2), ("scape", -4.8), ("▁beautiful", -6.5), ("▁", -2.0),
        ("a", -2.8), ("b", -2.9), ("c", -3.0), ("d", -3.1), ("e", -2.7),
        ("f", -3.3), ("g", -3.4), ("h", -3.5), ("i", -2.6), ("l", -3.0),
        ("n", -2.9), ("o", -2.8), ("p", -3.2), ("s", -3.0), ("t", -2.7),
        ("u", -3.1), ("r", -3.0), ("▁un", -4.2), ("un", -3.9), ("ti", -3.6),
        ("tion", -4.1), ("▁na", -4.4),
    ]
    pieces += [(w, s, spm.NORMAL) for w, s in words]
    return pieces


STRINGS = [
    "a painting",
    "the oil painting of a landscape",
    "beautiful landscape painting",
    "unpainting nation",
    "a",
    "the the the",
    "  spaced   out  ",
    "paintingpaintingpainting",
    "naptic",  # forces char-level pieces
]


def test_model_roundtrip(tmp_path):
    pieces = _fixture_pieces()
    blob = spm.write_model(pieces, unk_id=2, bos_id=-1, eos_id=1, pad_id=0)
    parsed, meta = spm.parse_model(blob)
    assert [(p, t) for p, _, t in parsed] == [(p, t) for p, _, t in pieces]
    np.testing.assert_allclose(  # scores serialize as float32
        [s for _, s, _ in parsed], [s for _, s, _ in pieces], rtol=1e-6
    )
    assert meta == {"unk_id": 2, "bos_id": -1, "eos_id": 1, "pad_id": 0}
    path = tmp_path / "tiny.model"
    path.write_bytes(blob)
    tok = spm.load_unigram(str(path))
    assert tok.unk_id == 2 and tok.eos_id == 1 and tok.pad_id == 0


def test_parity_vs_hf_unigram_oracle():
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    pieces = _fixture_pieces()
    tok = spm.SPMUnigram(pieces, {"unk_id": 2})

    hf_vocab = [(p, s) for p, s, _ in pieces]
    hf = Tokenizer(models.Unigram(hf_vocab, unk_id=2, byte_fallback=False))
    # Metaspace doesn't collapse whitespace; emulate sentencepiece's
    # remove_extra_whitespaces on the HF side so the ORACLE covers the
    # unigram Viterbi itself
    hf.normalizer = normalizers.Sequence([
        normalizers.NFKC(),
        normalizers.Replace(tokenizers.Regex(r"\s+"), " "),
        normalizers.Strip(),
    ])
    hf.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="first"
    )

    for s in STRINGS:
        # the HF pipeline has an alignment quirk when Strip removes leading
        # chars (prepend_scheme="first" fails to fire); feed it the
        # pre-stripped string — real sentencepiece strips internally
        ours = tok.encode_as_ids(s)
        theirs = hf.encode(" ".join(s.split())).ids
        assert ours == theirs, (s, ours, theirs)

    # our normalization collapses extra whitespace exactly
    assert tok.encode_as_ids("  spaced   out  ") == tok.encode_as_ids(
        "spaced out"
    )


def test_normalize_maps_tabs_and_newlines_to_space():
    # nmt_nfkc maps \t/\n/\r (category Cc!) to space — dropping them
    # would fuse words across line breaks; other control chars drop
    pieces = _fixture_pieces()
    tok = spm.SPMUnigram(pieces, {"unk_id": 2})
    assert tok.normalize("line1\nline2") == tok.normalize("line1 line2")
    assert tok.normalize("a\tb\r\nc") == tok.normalize("a b c")
    assert tok.encode_as_ids("line1\nline2") == tok.encode_as_ids(
        "line1 line2"
    )
    # a genuine (non-whitespace) control char still drops
    assert tok.normalize("a\x00b") == tok.normalize("ab")


def test_parity_unknown_chars_fused():
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    pieces = _fixture_pieces()
    tok = spm.SPMUnigram(pieces, {"unk_id": 2})
    hf = Tokenizer(
        models.Unigram([(p, s) for p, s, _ in pieces], unk_id=2,
                       byte_fallback=False)
    )
    hf.normalizer = normalizers.NFKC()
    hf.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="first"
    )
    for s in ["a 中文 painting", "©®", "a🙂b", "中中中"]:
        ours = tok.encode_as_ids(s)
        theirs = hf.encode(s).ids
        assert ours == theirs, (s, ours, theirs)


def test_byte_fallback():
    pieces = _fixture_pieces() + [
        (f"<0x{b:02X}>", 0.0, spm.BYTE) for b in range(256)
    ]
    tok = spm.SPMUnigram(pieces, {"unk_id": 2})
    ids = tok.encode_as_ids("a中")
    # "中" = e4 b8 ad in utf-8 -> three byte pieces, no unk
    assert tok.unk_id not in ids
    assert [tok.pieces[i][0] for i in ids[-3:]] == [
        "<0xE4>", "<0xB8>", "<0xAD>",
    ]
    assert tok.decode_ids(ids).endswith("中")


def test_decode_roundtrip():
    tok = spm.SPMUnigram(_fixture_pieces(), {"unk_id": 2})
    s = "the oil painting of a landscape"
    assert tok.decode_ids(tok.encode_as_ids(s)) == s


# --------------------------------------------------------------------------
# real-path wiring: T5 + Marian tokenizers driven by real-format assets
# --------------------------------------------------------------------------

def test_t5_tokenize_real_path(tmp_path, monkeypatch):
    from clip_diffusion_tpu.models import t5 as t5_mod

    blob = spm.write_model(_fixture_pieces(), unk_id=2, bos_id=-1,
                           eos_id=1, pad_id=0)
    path = tmp_path / "spiece.model"
    path.write_bytes(blob)
    monkeypatch.setenv("T5_SPM_PATH", str(path))
    t5_mod._spm.cache_clear()
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any hash-fallback warning fails
            ids = t5_mod.t5_tokenize(["a painting", "the oil painting"],
                                     max_len=16)
        tok = spm.SPMUnigram(_fixture_pieces(), {"unk_id": 2})
        row0 = tok.encode_as_ids("a painting") + [1]  # + </s>
        assert ids.shape == (2, 16)
        assert list(ids[0][: len(row0)]) == row0
        assert (ids[0][len(row0):] == 0).all()  # pad
    finally:
        t5_mod._spm.cache_clear()


def test_marian_tokenize_real_path(tmp_path, monkeypatch):
    from clip_diffusion_tpu.models import marian as marian_mod

    pieces = _fixture_pieces()
    blob = spm.write_model(pieces, unk_id=2)
    spm_path = tmp_path / "source.spm"
    spm_path.write_bytes(blob)
    # HF MarianTokenizer maps pieces through a SEPARATE vocab.json whose
    # ids differ from the spm ids (models/marian.py:264-270)
    vocab = {p: 100 + i for i, (p, _, _) in enumerate(pieces)}
    vocab["<unk>"] = 1
    vocab_path = tmp_path / "vocab.json"
    vocab_path.write_text(json.dumps(vocab))
    monkeypatch.setenv("MARIAN_SPM_PATH", str(spm_path))
    monkeypatch.setenv("MARIAN_VOCAB_PATH", str(vocab_path))
    marian_mod._assets.cache_clear()
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            ids = marian_mod.marian_tokenize("a painting", max_len=8)
        cfg = marian_mod.MarianConfig.opus_zh_en()
        tok = spm.SPMUnigram(pieces, {"unk_id": 2})
        expect = [vocab[p] for p in tok.encode_as_pieces("a painting")]
        row = list(ids[0])
        assert row[: len(expect)] == expect
        assert row[len(expect)] == cfg.eos_token_id
        assert all(v == cfg.pad_token_id for v in row[len(expect) + 1:])
    finally:
        marian_mod._assets.cache_clear()
