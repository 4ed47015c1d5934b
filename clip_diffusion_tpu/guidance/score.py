"""CLIP-score harness: the fixed-prompt parity metric.

The reference never *reports* a text↔image score, but its whole guidance
objective is the squared spherical distance between CLIP embeddings of the
cutouts and the prompt (reference losses.py:10-16, sample.py:179-198) — so
the natural end-of-run quality metric for parity checks is the same
geometry evaluated on the FINAL image: cosine similarity (standard "CLIP
score", higher is better) and squared spherical distance (the quantity
guidance descends, lower is better), per perceptor and averaged.

The image is preprocessed exactly like the reference's CLIP_PREPROCESS
(resize shorter side + center crop + CLIP normalize, reference
functional.py:19-26) — NOT through the cutout engine — so the score is a
property of the image, independent of the guidance schedule that produced
it.

`PROMPT_SUITE` is the fixed prompt suite from BASELINE.json's north star
("CLIP-score parity on a fixed prompt suite"): scores are only comparable
across frameworks when the prompt set and the tower weights match, so a
provisioned deployment (converted OpenAI checkpoints + real BPE table)
evaluates the suite with `tools/clip_score.py` and compares against the
reference's numbers on the same suite.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Fixed suite: the bench prompt first, then a spread of subject/style
# axes (portrait, architecture, nature, object, abstract, zh-translated
# intent, long-tail modifier-style phrasing).
PROMPT_SUITE: Tuple[str, ...] = (
    "a beautiful landscape painting",
    "a portrait of an old fisherman, oil on canvas",
    "a futuristic city skyline at dusk, concept art",
    "a watercolor painting of a fox in a snowy forest",
    "an ornate brass astrolabe on velvet, studio photograph",
    "abstract geometric shapes in warm colors, bauhaus style",
    "a lighthouse on a cliff at golden hour",
    "a steampunk airship above snowy mountains, trending on artstation",
)


def clip_scores(
    clips: Dict[str, tuple],
    image01,
    prompt: str,
) -> Dict[str, Dict[str, float]]:
    """Per-perceptor CLIP scores of one [0,1] HWC image against `prompt`.

    clips: zoo-style {name: (CLIPModel, params)}.  Returns
    {"cosine": {name: v, ..., "mean": v},
     "spherical": {name: v, ..., "mean": v}}.
    """
    from clip_diffusion_tpu.guidance.losses import l2_normalize
    from clip_diffusion_tpu.models.clip import tokenize
    from clip_diffusion_tpu.models.clip.model import CLIPModel, clip_normalize
    from clip_diffusion_tpu.ops.resize import resize_center_crop

    img = jnp.asarray(image01, jnp.float32)
    cos: Dict[str, float] = {}
    sph: Dict[str, float] = {}
    for name, (model, params) in clips.items():
        res = model.cfg.image_resolution
        square = resize_center_crop(img, res)
        toks = jnp.asarray(tokenize([prompt]))
        ie, te = _jit_score_embed(model)(params, clip_normalize(square[None]),
                                         toks)
        ie = l2_normalize(ie, axis=-1)[0]
        te = l2_normalize(te, axis=-1)[0]
        c = float(jnp.clip(jnp.dot(ie, te), -1.0, 1.0))
        cos[name] = round(c, 4)
        # squared spherical distance of unit vectors, the guidance loss's
        # geometry (reference losses.py:10-16): (2*arcsin(|u-v|/2))^2
        sph[name] = round(float((2.0 * np.arcsin(
            min(1.0, np.linalg.norm(np.asarray(ie) - np.asarray(te)) / 2.0)
        )) ** 2), 4)
    cos["mean"] = round(float(np.mean([v for v in cos.values()])), 4)
    sph["mean"] = round(float(np.mean([v for v in sph.values()])), 4)
    return {"cosine": cos, "spherical": sph}


@functools.lru_cache(maxsize=None)
def _jit_score_embed(model):
    """One cached two-tower embed program per CLIPModel (params as jit
    arguments — closures would serialize the tower into the HLO).  Keyed
    on the module itself: flax modules are frozen dataclasses, so two
    handles to the same tower config hash equal and reuse the program."""
    from clip_diffusion_tpu.models.clip.model import CLIPModel

    return jax.jit(
        lambda p, im, tok: (
            model.apply(p, im, method=CLIPModel.encode_image),
            model.apply(p, tok, method=CLIPModel.encode_text),
        )
    )


def score_suite(clips, sample_fn, prompts=PROMPT_SUITE):
    """Evaluate the fixed prompt suite: `sample_fn(prompt) -> [0,1] HWC
    image`; returns [(prompt, scores_dict), ...] plus the suite mean — the
    parity table to compare against the reference on real weights."""
    rows = []
    for p in prompts:
        rows.append((p, clip_scores(clips, sample_fn(p), p)))
    mean = round(
        float(np.mean([r[1]["cosine"]["mean"] for r in rows])), 4
    )
    return rows, mean
