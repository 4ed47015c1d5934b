#!/usr/bin/env python
"""Build embedding banks for modifier retrieval and image analysis.

The reference ships precomputed banks (data/csv/modifiers.csv 120 keywords,
styles.csv 397, media.csv 95, with per-model embedding .npy + faiss
indices; reference prompt.py:22-24, utils/anvil_utils.py:19-33).  This tool
regenerates equivalents from the carried CSVs using this framework's own
towers: sentence-T5 for modifiers (the reference uses
sentence-transformers/sentence-t5-base, prompt.py:18-20), CLIP text towers
for styles/media — no faiss required (text/retrieval.py does exact IP
top-k over these small banks).

Typical use (after converting real checkpoints with fetch_and_convert.py):

    python tools/build_banks.py --all --out data/banks

or one bank at a time:

    python tools/build_banks.py --keywords data/csv/styles.csv \
        --kind styles --models ViT-B/16 ViT-L/14 --out data/banks
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# CSV column holding the keyword, per kind (reference prompt.py:65,
# anvil_utils.py:87-91)
KIND_COLUMNS = {"modifiers": "Keyword", "styles": "style", "media": "medium"}


def read_keywords(path: str, column: str = None):
    """Keyword list from a one-per-line text file or a CSV (by header name,
    falling back to the first column)."""
    if path.endswith(".csv"):
        with open(path, newline="", encoding="utf-8") as f:
            rows = list(csv.reader(f))
        header, body = rows[0], rows[1:]
        col = header.index(column) if column and column in header else 0
        return [r[col] for r in body if r]
    with open(path, encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]


def write_names(out_dir: str, kind: str, keywords):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{kind}_names.txt"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(keywords))


def build_clip_bank(keywords, kind, model_names, out_dir, seed=0):
    """Per-CLIP-model text embeddings of the keywords (normalized — the
    reference banks are IP-metric over unit vectors).  Towers come from
    zoo.load_or_init_clip — the SAME constructor build_models uses for the
    serving towers (converted checkpoints when provisioned, name-seeded
    deterministic init otherwise), so bank and query embeddings always
    agree."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_diffusion_tpu.guidance.losses import l2_normalize
    from clip_diffusion_tpu.models.clip import CLIPModel
    from clip_diffusion_tpu.models.clip.tokenizer import tokenize
    from clip_diffusion_tpu.zoo import checkpoint_dir, clip_checkpoint_name, load_or_init_clip

    write_names(out_dir, kind, keywords)
    toks = jnp.asarray(tokenize(keywords))
    for name in model_names:
        if checkpoint_dir(clip_checkpoint_name(name)) is None:
            print(f"WARNING: no converted checkpoint for {name} — bank "
                  "embeddings come from a deterministic random tower "
                  "(consistent with build_models' serving towers, but "
                  "semantically meaningless; run fetch_and_convert.py first "
                  "in a networked deployment)")
        model, params = load_or_init_clip(name, param_dtype=jnp.float32,
                                          seed=seed)
        emb = l2_normalize(
            jax.jit(lambda p, t, m=model: m.apply(
                p, t, method=CLIPModel.encode_text
            ))(params, toks),
            axis=-1,
        )
        out = os.path.join(out_dir, f"{kind}_{name.replace('/', '_')}.npy")
        np.save(out, np.asarray(emb, np.float32))
        print(f"{out}: {emb.shape}")


def build_modifier_bank(keywords, out_dir, seed=0):
    """Sentence-T5 embeddings of the modifier keywords (already unit-norm —
    SentenceT5 L2-normalizes its pooled projection).  Uses the same
    load-or-init constructor as the query encoder (text/prompt.py), so the
    bank and queries always share one tower."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_diffusion_tpu.models.t5 import (
        load_or_init_sentence_t5,
        t5_tokenize,
    )

    write_names(out_dir, "modifiers", keywords)
    model, params = load_or_init_sentence_t5(seed=seed)
    toks = jnp.asarray(t5_tokenize(keywords))
    emb = jax.jit(model.apply)(params, toks)
    out = os.path.join(out_dir, "modifiers_t5.npy")
    np.save(out, np.asarray(emb, np.float32))
    print(f"{out}: {emb.shape}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--all", action="store_true",
                   help="build modifiers+styles+media from data/csv/")
    p.add_argument("--keywords")
    p.add_argument("--kind", default="styles",
                   choices=("modifiers", "styles", "media"))
    p.add_argument("--models", nargs="+", default=["ViT-B/16", "ViT-L/14"])
    p.add_argument("--out", default="data/banks")
    p.add_argument("--csv-dir", default="data/csv")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (leave the TPU free)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.all:
        for kind in ("modifiers", "styles", "media"):
            kws = read_keywords(
                os.path.join(args.csv_dir, f"{kind}.csv"), KIND_COLUMNS[kind]
            )
            if kind == "modifiers":
                build_modifier_bank(kws, args.out, args.seed)
            else:
                build_clip_bank(kws, kind, args.models, args.out, args.seed)
        return

    if not args.keywords:
        p.error("--keywords required unless --all")
    kws = read_keywords(args.keywords, KIND_COLUMNS.get(args.kind))
    if args.kind == "modifiers":
        build_modifier_bank(kws, args.out, args.seed)
    else:
        build_clip_bank(kws, args.kind, args.models, args.out, args.seed)


if __name__ == "__main__":
    main()
