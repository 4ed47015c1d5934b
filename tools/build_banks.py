#!/usr/bin/env python
"""Build embedding banks for modifier retrieval and image analysis.

The reference ships precomputed banks (data/csv/modifiers.csv 120 keywords,
styles.csv 397, media.csv 95, with per-model embedding .npy + faiss
indices; reference prompt.py:22-24, utils/anvil_utils.py:19-33).  This tool
regenerates equivalents from keyword lists using this framework's own CLIP
text towers (for styles/media, which the reference embeds with CLIP) —
no faiss required (text/retrieval.py does exact IP top-k).

Input: a text file with one keyword per line (or a CSV whose first column
is the keyword).  Output: <out>/<kind>_<model>.npy + <kind>_names.txt.

    python tools/build_banks.py --keywords styles.txt --kind styles \
        --models ViT-B/16 ViT-L/14 --out data/banks
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def read_keywords(path: str):
    if path.endswith(".csv"):
        with open(path, newline="", encoding="utf-8") as f:
            rows = list(csv.reader(f))
        header = rows[0]
        return [r[0] for r in rows[1:] if r]
    with open(path, encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--keywords", required=True)
    p.add_argument("--kind", default="styles")
    p.add_argument("--models", nargs="+", default=["ViT-B/16", "ViT-L/14"])
    p.add_argument("--out", default="data/banks")
    p.add_argument("--normalize", action="store_true", default=True)
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from clip_diffusion_tpu.config import Config
    from clip_diffusion_tpu.guidance.losses import l2_normalize
    from clip_diffusion_tpu.models.clip.model import CLIPModel
    from clip_diffusion_tpu.models.clip.tokenizer import tokenize
    from clip_diffusion_tpu.zoo import build_models

    keywords = read_keywords(args.keywords)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"{args.kind}_names.txt"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(keywords))

    config = Config(chosen_clip_models=tuple(args.models))
    models = build_models(config)
    toks = jnp.asarray(tokenize(keywords))
    for name, (model, params) in models.clips.items():
        emb = model.apply(params, toks, method=CLIPModel.encode_text)
        if args.normalize:
            emb = l2_normalize(emb, axis=-1)
        out = os.path.join(
            args.out, f"{args.kind}_{name.replace('/', '_')}.npy"
        )
        np.save(out, np.asarray(emb, np.float32))
        print(f"{out}: {emb.shape}")


if __name__ == "__main__":
    main()
