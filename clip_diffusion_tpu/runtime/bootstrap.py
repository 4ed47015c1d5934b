"""Service bootstrap — the ColabHelper analog.

The reference boots by cloning five repos, pip-installing them, creating
output/model dirs, connecting the Anvil uplink and blocking in
`wait_forever` (reference utils/colab_helper.py:9-78, notebook cells 4-17).
Here bootstrap = build the model zoo once (converted checkpoints when
present, random init otherwise), wire the pipelines + analyzer into the
HTTP server, and serve.

    python -m clip_diffusion_tpu.runtime.bootstrap --port 8080
"""

from __future__ import annotations

import argparse
import os

from clip_diffusion_tpu.config import Config


def build_service(config: Config | None = None, with_latent: bool = False,
                  tiny: bool = False, port: int = 8080):
    """Assemble models + server (not yet serving)."""
    import functools

    from clip_diffusion_tpu import sample as sample_mod
    from clip_diffusion_tpu.runtime.server import ClipDiffusionServer
    from clip_diffusion_tpu.zoo import (
        build_latent_models,
        build_latent_pipeline,
        build_models,
    )

    config = config or Config()
    if tiny:
        config = config.replace(chosen_clip_models=())

    models = build_models(config) if not tiny else None
    guided_fn = functools.partial(
        sample_mod.guided_diffusion_sample, models=models
    )

    latent_fn = sample_mod.latent_diffusion_sample
    if with_latent:
        lmodels = build_latent_models(tiny=tiny)
        lpipe, text_encode = build_latent_pipeline(lmodels)
        latent_fn = functools.partial(
            sample_mod.latent_diffusion_sample, pipe=lpipe,
            text_encode=text_encode,
        )

    analyzer = None
    data_dir = os.environ.get("CLIP_DIFFUSION_DATA", "data/banks")
    if models is not None:
        from clip_diffusion_tpu.parallel.serving import (
            analyze_image,
            load_analysis_bank,
        )

        bank = load_analysis_bank(data_dir)
        if bank is not None:
            import jax

            from clip_diffusion_tpu.models.clip.model import CLIPModel

            embed_fns = {}
            # analysis uses ViT-B/16 + ViT-L/14 (reference
            # anvil_utils.py:75-95)
            for name in ("ViT-B/16", "ViT-L/14"):
                if name in models.clips:
                    mod, prms = models.clips[name]
                    jfn = jax.jit(
                        lambda p, im, m=mod: m.apply(
                            p, im, method=CLIPModel.encode_image
                        )
                    )
                    embed_fns[name] = lambda im, f=jfn, p=prms: f(p, im)
            if embed_fns:
                analyzer = functools.partial(
                    analyze_image, clip_embed_fns=embed_fns, bank=bank
                )
    return ClipDiffusionServer(
        port=port, config=config, guided_fn=guided_fn, latent_fn=latent_fn,
        analyzer=analyzer,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--with-latent", action="store_true")
    p.add_argument("--tiny", action="store_true", help="test doubles")
    args = p.parse_args()
    server = build_service(
        with_latent=args.with_latent, tiny=args.tiny, port=args.port
    )
    print(f"clip-diffusion-tpu serving on :{server.port}")
    server.serve_forever()  # wait_forever analog


if __name__ == "__main__":
    main()
