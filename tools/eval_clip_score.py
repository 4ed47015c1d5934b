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
    python tools/eval_clip_score.py --certify    # deploy acceptance gate

--certify (VERDICT r4 item 8) is the one-command acceptance runbook for a
NETWORKED deployment (after `python tools/fetch_and_convert.py --all`):
checks that every expected converted-checkpoint slot is present, loads
each through the shape-validated gate, runs a finite forward per family,
and reports the provenance verdict the serving artifacts carry.  With
`--generated DIR --reference-outputs DIR` it additionally scores both
image sets on the fixed prompt suite and enforces
|mean(ours) - mean(reference)| <= --score-tolerance (default 0.02 cosine —
generous vs the <=1e-3 converter parity in tests/test_convert*.py, since
end-to-end sampling is seeded differently).  Emits ONE pass/fail JSON
line; exit 0 only on PASS.  Per-family parity thresholds are documented
in docs/MIGRATION.md §"Real-weights acceptance".
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


# Converted-checkpoint slots fetch_and_convert.py --all provisions under
# models/flax/ (see zoo.load_or_init / build_latent_models / registry).
CERTIFY_SLOTS = {
    "guided_unet_512": "ADM 552M UNet (reference models.py:95-116)",
    "clip_ViT-B_32": "CLIP ViT-B/32", "clip_ViT-B_16": "CLIP ViT-B/16",
    "clip_ViT-L_14": "CLIP ViT-L/14", "clip_RN50": "CLIP RN50",
    "clip_RN101": "CLIP RN101",
    "ldm_unet": "latent-diffusion UNet (1.45B stack)",
    "ldm_vq": "VQ-f8 autoencoder", "ldm_bert": "LDM BERT text encoder",
    "esrgan_x4": "Real-ESRGAN x4", "esrgan_x2": "Real-ESRGAN x2",
    "lpips_vgg": "LPIPS VGG16+lin",
}
CERTIFY_DATA_ASSETS = {
    "data/bpe_simple_vocab_16e6.txt.gz": "CLIP BPE vocabulary",
    "data/bert-base-uncased-vocab.txt": "BERT WordPiece vocab (LDM)",
    "data/t5-spiece.model": "sentence-T5 SentencePiece model",
    "data/opencc/tw2sp_phrases.tsv": "OpenCC tw2sp phrase table",
}


def certify(args):
    import numpy as np

    checks = {}
    failures = []

    slots = {}
    for slot, desc in CERTIFY_SLOTS.items():
        present = os.path.isdir(os.path.join("models", "flax", slot))
        slots[slot] = "present" if present else "MISSING"
        if not present:
            failures.append(f"checkpoint slot {slot} ({desc})")
    checks["checkpoint_slots"] = slots

    assets = {}
    for path, desc in CERTIFY_DATA_ASSETS.items():
        ok = os.path.isfile(path)
        assets[path] = "present" if ok else "MISSING"
        if not ok and "opencc" not in path:  # opencc tier is optional
            failures.append(f"data asset {path} ({desc})")
    checks["data_assets"] = assets

    # Validated load + finite forward per family actually present (the
    # builders go through utils.checkpoint.load_validated_params, so a
    # shape/structure mismatch raises here rather than silently serving
    # random weights).  Minimal shapes: certify is an acceptance gate,
    # not a benchmark.
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from clip_diffusion_tpu.config import Config
    from clip_diffusion_tpu.zoo import (
        build_latent_models,
        build_models,
        weights_provenance,
    )

    forwards = {}
    if all(v == "present" for v in slots.values()):
        try:
            config = Config()
            models = build_models(config, image_size=512, with_lpips=True)
            x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
            out = models.unet.apply(models.unet_params, x, jnp.zeros((1,)))
            forwards["guided_unet_512"] = (
                "finite" if bool(np.isfinite(np.asarray(
                    out, np.float32)).all()) else "NON-FINITE"
            )
            for name, (m, p) in models.clips.items():
                from clip_diffusion_tpu.models.clip.model import CLIPModel

                res = m.cfg.image_resolution
                emb = m.apply(p, jnp.zeros((1, res, res, 3)),
                              method=CLIPModel.encode_image)
                forwards[f"clip_{name}"] = (
                    "finite" if bool(np.isfinite(np.asarray(
                        emb, np.float32)).all()) else "NON-FINITE"
                )
            lmodels = build_latent_models()
            lcfg = lmodels.unet.config
            z = jnp.zeros((1, 8, 8, lcfg.in_channels), jnp.bfloat16)
            ctx = jnp.zeros((1, 4, lcfg.context_dim), jnp.bfloat16)
            lo = lmodels.unet.apply(lmodels.unet_params, z,
                                    jnp.zeros((1,)), ctx)
            forwards["ldm_unet"] = (
                "finite" if bool(np.isfinite(np.asarray(
                    lo, np.float32)).all()) else "NON-FINITE"
            )
        except Exception as e:  # noqa: BLE001 — a failed validated load
            forwards["error"] = str(e)[:300]
            failures.append(f"validated load/forward: {e}")
        bad = [k for k, v in forwards.items() if v == "NON-FINITE"]
        failures.extend(f"non-finite forward: {k}" for k in bad)
        prov = weights_provenance()
        checks["provenance"] = prov
        if not prov["reference_comparable"]:
            failures.append(
                "provenance not reference-comparable "
                f"(weights={prov['weights']}, tokenizer={prov['tokenizer']})"
            )
    else:
        checks["provenance"] = "skipped (slots missing)"
    checks["forwards"] = forwards

    # Optional end-to-end CLIP-score parity vs the reference's own outputs
    if args.generated and args.reference_outputs:
        ours = _score_dir(args.generated, args.clip)
        ref = _score_dir(args.reference_outputs, args.clip)
        delta = abs(float(np.mean(ours)) - float(np.mean(ref)))
        checks["clip_score_parity"] = {
            "ours_mean": round(float(np.mean(ours)), 4),
            "reference_mean": round(float(np.mean(ref)), 4),
            "abs_delta": round(delta, 4),
            "tolerance": args.score_tolerance,
        }
        if delta > args.score_tolerance:
            failures.append(
                f"clip-score delta {delta:.4f} > {args.score_tolerance}"
            )
    else:
        checks["clip_score_parity"] = (
            "skipped (pass --generated and --reference-outputs)"
        )

    verdict = "PASS" if not failures else "FAIL"
    print(json.dumps({"certify": verdict, "failures": failures,
                      "checks": checks}))
    return 0 if verdict == "PASS" else 1


def _score_dir(pattern, clip_name):
    """CLIP scores for a directory/glob of images against PROMPT_SUITE
    (sorted filename order pairs with suite order)."""
    import jax
    import jax.numpy as jnp

    from clip_diffusion_tpu.models.clip.model import (
        CLIP_PRESETS,
        CLIPModel,
    )
    from clip_diffusion_tpu.utils.image_io import load_image
    from clip_diffusion_tpu.zoo import load_or_init_clip

    paths = sorted(
        glob.glob(os.path.join(pattern, "*.png"))
        + glob.glob(os.path.join(pattern, "*.jpg"))
    ) or sorted(glob.glob(pattern))
    images = [load_image(p) for p in paths]
    model, params = load_or_init_clip(clip_name)
    embed_i = jax.jit(
        lambda p, im: model.apply(p, im, method=CLIPModel.encode_image)
    )
    embed_t = jax.jit(
        lambda p, t: model.apply(p, t, method=CLIPModel.encode_text)
    )
    return clip_score(
        lambda im: embed_i(params, im), lambda t: embed_t(params, t),
        images, PROMPT_SUITE[: len(images)],
        resolution=CLIP_PRESETS[clip_name].image_resolution,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", nargs="*", default=[])
    p.add_argument("--prompts", type=str, default=None)
    p.add_argument("--clip", type=str, default="ViT-B/32")
    p.add_argument("--selftest", action="store_true")
    p.add_argument("--certify", action="store_true",
                   help="deploy acceptance gate: emits one pass/fail JSON "
                        "line (see module docstring)")
    p.add_argument("--generated", type=str, default=None,
                   help="(certify) dir/glob of images generated HERE on "
                        "the fixed prompt suite")
    p.add_argument("--reference-outputs", type=str, default=None,
                   help="(certify) dir/glob of the torch reference's "
                        "outputs on the same suite")
    p.add_argument("--score-tolerance", type=float, default=0.02)
    args = p.parse_args()

    if args.certify:
        sys.exit(certify(args))

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
