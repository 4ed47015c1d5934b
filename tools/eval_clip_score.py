#!/usr/bin/env python
"""CLIP-score parity harness (BASELINE.md: "CLIP score parity with reference
on fixed prompt suite").

Scores image-text alignment as cosine similarity between CLIP embeddings of
the generated image and its prompt, averaged over a fixed prompt suite —
comparable directly against the reference implementation's outputs scored
with the same CLIP model and prompts.

Usage:
    python tools/eval_clip_score.py --images out/*.png --prompts prompts.txt
    python tools/eval_clip_score.py --selftest   # tiny-model wiring check
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The fixed evaluation suite (stable across rounds for comparability).
PROMPT_SUITE = [
    "a cute golden retriever",
    "a lighthouse on a cliff at sunset, oil painting",
    "a futuristic city skyline at night, neon lights",
    "a bowl of fresh fruit on a wooden table",
    "an ancient castle in the mist, fantasy art",
    "a portrait of an astronaut, studio lighting",
    "a sailboat on a calm sea at dawn",
    "a snowy mountain landscape with pine trees",
]


def clip_score(embed_image, embed_text, images01, prompts, resolution=224):
    """Mean cosine similarity over (image, prompt) pairs."""
    import jax.numpy as jnp
    import numpy as np

    from clip_diffusion_tpu.guidance.losses import l2_normalize
    from clip_diffusion_tpu.models.clip.model import clip_normalize
    from clip_diffusion_tpu.models.clip.tokenizer import tokenize
    from clip_diffusion_tpu.ops.resize import resize_center_crop

    scores = []
    toks = tokenize(prompts)
    text_emb = np.asarray(l2_normalize(embed_text(jnp.asarray(toks)), axis=-1))
    for img, temb in zip(images01, text_emb):
        # reference CLIP preprocess: resize shorter side + center crop
        # (reference functional.py:19-26)
        square = resize_center_crop(jnp.asarray(img, jnp.float32), resolution)
        iemb = np.asarray(
            l2_normalize(embed_image(clip_normalize(square[None])), axis=-1)
        )[0]
        scores.append(float(iemb @ temb))
    return scores


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", nargs="*", default=[])
    p.add_argument("--prompts", type=str, default=None)
    p.add_argument("--clip", type=str, default="ViT-B/32")
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args()

    import jax

    if args.selftest:
        jax.config.update("jax_platforms", "cpu")  # tiny models: CPU is faster

    import jax.numpy as jnp
    import numpy as np

    from clip_diffusion_tpu.models.clip.model import (
        CLIP_PRESETS,
        CLIPModel,
        tiny_clip_config,
    )

    if args.selftest:
        cfg = tiny_clip_config()
        model = CLIPModel(cfg)
        from clip_diffusion_tpu.models.clip.tokenizer import tokenize

        params = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, 32, 32, 3)),
            jnp.asarray(tokenize(["x"])),
        )
        imgs = [np.random.default_rng(i).uniform(0, 1, (64, 64, 3))
                for i in range(2)]
        scores = clip_score(
            lambda im: model.apply(params, im, method=CLIPModel.encode_image),
            lambda t: model.apply(params, t, method=CLIPModel.encode_text),
            imgs, PROMPT_SUITE[:2], resolution=cfg.image_resolution,
        )
        print(json.dumps({"selftest_scores": scores}))
        return

    from clip_diffusion_tpu.config import Config
    from clip_diffusion_tpu.utils.image_io import load_image
    from clip_diffusion_tpu.zoo import build_models

    prompts = (
        open(args.prompts).read().splitlines() if args.prompts else PROMPT_SUITE
    )
    paths = sorted(sum([glob.glob(g) for g in args.images], []))
    images = [load_image(p) for p in paths]
    config = Config(chosen_clip_models=(args.clip,))
    models = build_models(config)  # converted checkpoints via convert.py
    model, params = models.clips[args.clip]
    # params as jit args (closures embed weights into the compile payload)
    embed_i = jax.jit(
        lambda p, im: model.apply(p, im, method=CLIPModel.encode_image)
    )
    embed_t = jax.jit(
        lambda p, t: model.apply(p, t, method=CLIPModel.encode_text)
    )
    scores = clip_score(
        lambda im: embed_i(params, im),
        lambda t: embed_t(params, t),
        images, prompts[: len(images)],
        resolution=CLIP_PRESETS[args.clip].image_resolution,
    )
    print(json.dumps({
        "metric": "clip_score",
        "value": float(np.mean(scores)),
        "per_image": dict(zip(paths, scores)),
        "clip_model": args.clip,
    }))


if __name__ == "__main__":
    main()
