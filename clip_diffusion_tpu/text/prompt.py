"""Prompt front end.

Reference behavior (reference prompt.py:27-85): translate Chinese prompts
to English, optionally retrieve the nearest artist/style modifier keywords
(sentence-T5 embedding -> inner-product search over 120 modifiers) and
append them plus ", trending on artstation.", then split "text:weight".
"""

from __future__ import annotations

import csv
import functools
import os
import warnings
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from clip_diffusion_tpu.text.retrieval import EmbeddingIndex
from clip_diffusion_tpu.text.zh import translate_zh_to_en

ARTSTATION_SUFFIX = ", trending on artstation."

# default data root (carried CSVs under <root>/csv, generated banks under
# <root>/banks; see data/README.md)
DATA_ROOT = os.environ.get(
    "CLIP_DIFFUSION_DATA",
    os.path.join(os.path.dirname(__file__), "..", "..", "data"),
)


class ModifierBank:
    """Modifier keywords + their sentence embeddings + an encoder.

    The reference ships data/csv/modifiers.csv (120 keywords) with
    precomputed sentence-T5 embeddings and a faiss index (reference
    prompt.py:18-24); here the bank loads (keywords list, (N,D) .npy)
    from `CLIP_DIFFUSION_DATA` or explicit paths, and the query encoder is
    injectable (sentence-T5 where available, any text-embedding fn
    otherwise)."""

    def __init__(
        self,
        keywords: Sequence[str],
        embeddings: np.ndarray,
        encoder: Callable[[str], np.ndarray],
    ):
        assert len(keywords) == embeddings.shape[0]
        self.keywords = list(keywords)
        self.index = EmbeddingIndex(embeddings)
        self.encoder = encoder

    @staticmethod
    def from_files(
        keywords_path: str, embeddings_path: str,
        encoder: Callable[[str], np.ndarray],
    ) -> "ModifierBank":
        with open(keywords_path, encoding="utf-8") as f:
            keywords = [line.strip() for line in f if line.strip()]
        return ModifierBank(keywords, np.load(embeddings_path), encoder)

    def topk(self, prompt: str, k: int) -> Tuple[np.ndarray, List[str]]:
        emb = np.asarray(self.encoder(prompt), np.float32).reshape(1, -1)
        scores, idx = self.index.search(emb, k)
        return scores[0], [self.keywords[i] for i in idx[0]]


def read_modifier_keywords(csv_path: str) -> List[str]:
    """The `Keyword` column of the carried modifiers.csv (the reference
    appends `modifier_df.iloc[index]['Keyword']`, prompt.py:65)."""
    with open(csv_path, newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    col = rows[0].index("Keyword") if "Keyword" in rows[0] else 0
    return [r[col] for r in rows[1:] if r]


def _default_t5_encoder():
    """Sentence-T5 query encoder matching tools/build_banks.py's bank tower
    (one shared constructor: converted $T5_PARAMS_PATH weights when
    provisioned, else the same deterministic init — query and bank
    embeddings always live in the same space)."""
    import jax
    import jax.numpy as jnp

    from clip_diffusion_tpu.models.t5 import (
        load_or_init_sentence_t5,
        t5_tokenize,
    )

    model, params = load_or_init_sentence_t5()
    apply = jax.jit(model.apply)

    def encode(text: str) -> np.ndarray:
        return np.asarray(apply(params, jnp.asarray(t5_tokenize([text]))))[0]

    return encode


@functools.lru_cache(maxsize=1)
def load_modifier_bank(data_root: Optional[str] = None) -> Optional[ModifierBank]:
    """Default ModifierBank from the shipped data assets: keywords from
    data/csv/modifiers.csv, embeddings from data/banks/modifiers_t5.npy
    (built by tools/build_banks.py), sentence-T5 query encoder.  Returns
    None (with a warning) when the assets are absent."""
    root = data_root or DATA_ROOT
    csv_path = os.path.join(root, "csv", "modifiers.csv")
    emb_path = os.path.join(root, "banks", "modifiers_t5.npy")
    if not (os.path.exists(csv_path) and os.path.exists(emb_path)):
        warnings.warn(
            f"modifier bank assets not found under {root} "
            "(need csv/modifiers.csv + banks/modifiers_t5.npy; run "
            "tools/build_banks.py --all) — auto-modifiers disabled"
        )
        return None
    keywords = read_modifier_keywords(csv_path)
    return ModifierBank(keywords, np.load(emb_path), _default_t5_encoder())


class Prompt:
    """Reference-compatible Prompt: `.text` and `.weight` after
    preprocessing (reference prompt.py:27-33).

    "text:weight" syntax parses a trailing float weight, defaulting to 1.0
    (reference prompt.py:80-85)."""

    def __init__(
        self,
        prompt: str,
        use_auto_modifiers: bool = False,
        num_modifiers: int = 1,
        modifier_bank: Optional[ModifierBank] = None,
        translator: Optional[Callable[[str], str]] = None,
    ):
        if not isinstance(prompt, str):
            raise TypeError("prompt has to be 'str' type")
        self.prompt = self._preprocess(
            prompt, use_auto_modifiers, num_modifiers, modifier_bank,
            translator,
        )
        self.text, self.weight = self._parse_weight(self.prompt)

    def _preprocess(self, prompt, use_auto_modifiers, num_modifiers,
                    bank, translator):
        prompt = translate_zh_to_en(prompt, translator)
        if use_auto_modifiers and bank is None:
            bank = load_modifier_bank()  # default shipped bank (or None)
        if use_auto_modifiers and bank is not None:
            _, keywords = bank.topk(prompt, num_modifiers)
            for kw in keywords:
                prompt += f", {kw}"
            prompt += ARTSTATION_SUFFIX
        return prompt

    @staticmethod
    def _parse_weight(prompt: str) -> Tuple[str, float]:
        parsed = prompt.split(":", 1)
        if len(parsed) == 1:
            return parsed[0], 1.0
        return parsed[0], float(parsed[1])
