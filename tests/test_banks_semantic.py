"""Post-conversion bank regeneration flow (VERDICT r2 item 7).

The one-command deploy recipe is:

    python tools/fetch_and_convert.py --all     # includes --banks
    # or separately: python tools/build_banks.py --all

The committed data/banks were generated with deterministic random towers
(data/README.md) — wiring is CI-testable, rankings are not.  The semantic
smoke checks below therefore gate on real converted assets and run only in
provisioned (networked) deployments.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _have_real_clip():
    from clip_diffusion_tpu.models.clip.tokenizer import default_bpe_path
    from clip_diffusion_tpu.zoo import checkpoint_dir, clip_checkpoint_name

    return default_bpe_path() is not None and checkpoint_dir(
        clip_checkpoint_name("ViT-B/16")
    ) is not None


def _have_real_t5():
    from clip_diffusion_tpu.models.t5 import _spm
    from clip_diffusion_tpu.zoo import checkpoint_dir

    _spm.cache_clear()
    have = _spm() is not None and checkpoint_dir("sentence_t5") is not None
    _spm.cache_clear()
    return have


def test_fetch_and_convert_wires_banks(monkeypatch):
    """--banks triggers tools/build_banks.main(["--all"]) after conversion
    (no network needed: conversion flags are all off)."""
    import tools.build_banks as bb
    import tools.fetch_and_convert as fc

    calls = []
    monkeypatch.setattr(bb, "main", lambda argv=None: calls.append(argv))
    fc.main(["--banks"])
    assert calls == [["--all"]]


@pytest.mark.skipif(not _have_real_clip(),
                    reason="real ViT-B/16 checkpoint + BPE table not "
                           "provisioned (zero-egress env); runs in "
                           "networked deployments after fetch_and_convert")
def test_semantic_style_retrieval_real_towers(tmp_path):
    """With real towers, 'an oil painting' retrieves painting-family styles
    from the regenerated bank."""
    from tools.build_banks import build_clip_bank, read_keywords

    import jax.numpy as jnp

    from clip_diffusion_tpu.guidance.losses import l2_normalize
    from clip_diffusion_tpu.models.clip import CLIPModel
    from clip_diffusion_tpu.models.clip.tokenizer import tokenize
    from clip_diffusion_tpu.text.retrieval import EmbeddingIndex
    from clip_diffusion_tpu.zoo import load_or_init_clip

    kws = read_keywords("data/csv/styles.csv", "style")
    build_clip_bank(kws, "styles", ["ViT-B/16"], str(tmp_path))
    bank = np.load(tmp_path / "styles_ViT-B_16.npy")

    model, params = load_or_init_clip("ViT-B/16", param_dtype=jnp.float32)
    q = model.apply(params, jnp.asarray(tokenize(["an oil painting"])),
                    method=CLIPModel.encode_text)
    q = np.asarray(l2_normalize(q, axis=-1))
    _, idx = EmbeddingIndex(bank).search(q, 5)
    top = [kws[i].lower() for i in idx[0]]
    assert any("paint" in t for t in top), top


@pytest.mark.skipif(not _have_real_t5(),
                    reason="real sentence-T5 checkpoint + spiece.model not "
                           "provisioned (zero-egress env); runs in "
                           "networked deployments after fetch_and_convert")
def test_semantic_modifier_retrieval_real_towers(tmp_path):
    """With the real sentence-T5, an art-style prompt retrieves a related
    modifier keyword (the reference's auto-modifier flow, prompt.py:55-68)."""
    from tools.build_banks import build_modifier_bank, read_keywords

    from clip_diffusion_tpu.text.prompt import (
        ModifierBank,
        Prompt,
        _default_t5_encoder,
    )

    kws = read_keywords("data/csv/modifiers.csv", "Keyword")
    build_modifier_bank(kws, str(tmp_path))
    bank = ModifierBank(
        kws, np.load(tmp_path / "modifiers_t5.npy"), _default_t5_encoder()
    )
    p = Prompt("a watercolor landscape", use_auto_modifiers=True,
               num_modifiers=3, modifier_bank=bank)
    assert p.text != "a watercolor landscape"  # modifiers appended
