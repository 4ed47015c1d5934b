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
        lpipe, lparams, text_encode = build_latent_pipeline(lmodels)
        latent_fn = functools.partial(
            sample_mod.latent_diffusion_sample, pipe=lpipe,
            latent_params=lparams, text_encode=text_encode,
        )

    analyzer = None
    if models is not None:
        # banks load from $CLIP_DIFFUSION_DATA/banks (the var names the
        # data ROOT everywhere: csv/ + banks/ + marian/ live under it)
        from clip_diffusion_tpu.parallel.serving import make_analyzer

        analyzer = make_analyzer(models)
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
