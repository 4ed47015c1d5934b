"""Pod-sharded batch serving + the service API surface.

Covers the reference's RPC layer (reference utils/anvil_utils.py:36-95 and
the notebook callables, SURVEY.md §2 L5): seed issuance, settings updates,
random prompt fetch, result retrieval, and CLIP image analysis — plus the
new pod-scale capability (BASELINE config 5): one request = a batch of
(prompt x seed) generations sharded over the device mesh, each chip running
the fused guided loop on its own shard with zero hot-loop collectives.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import weakref
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.config import Config
from clip_diffusion_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_collective_free,
)
from clip_diffusion_tpu.utils.seeds import seed_as_string


def get_seed() -> str:
    """Seed as a string, dodging JS integer overflow at the client
    (reference anvil_utils.py:36-39)."""
    return seed_as_string()


def change_settings(config: Config, **kwargs) -> Config:
    """Functional settings update — the `Config.update` RPC analog
    (reference anvil_utils.py:42-55): returns a NEW immutable Config."""
    return config.replace(**kwargs)


# artprompts.org category pages per UI prompt type (reference
# anvil_utils.py:14-18: 生物=creature, 景觀=environment, 物件=object)
PROMPT_TYPES = {
    "生物": "creature-prompts/",
    "景觀": "environment-prompts/",
    "物件": "object-prompt/",
}

# zero-egress stand-in banks, one per reference prompt type
_LOCAL_PROMPTS = {
    "生物": [
        "A luminous deep-sea creature with trailing fins.",
        "A moss-covered forest spirit with antlers.",
        "A clockwork dragon curled around a tower.",
    ],
    "景觀": [
        "A lighthouse on a cliff at golden hour, oil painting.",
        "An ancient forest with rays of light, matte painting.",
        "A steampunk airship above snowy mountains.",
    ],
    "物件": [
        "An ornate brass astrolabe on velvet.",
        "A crystal lantern glowing with blue fire.",
        "A weathered leather journal with golden clasps.",
    ],
}


def get_random_prompt(prompt_type: str = "景觀", fetcher=None) -> str:
    """Random prompt for a UI category (reference anvil_utils.py:58-65
    scrapes `artprompts.org/<category>`; the scrape is network-gated here —
    `fetcher(category_path)` injects it, a local per-category bank serves
    zero-egress deploys)."""
    path = PROMPT_TYPES.get(prompt_type, PROMPT_TYPES["景觀"])
    if fetcher is not None:
        # decide arity from the signature — catching TypeError around the
        # CALL would swallow bugs inside a legitimate one-arg fetcher
        import inspect

        try:
            inspect.signature(fetcher).bind(path)
        except TypeError:
            return fetcher()  # round-1 contract: zero-arg scrape hook
        except ValueError:
            # C-implemented callables can have no introspectable
            # signature; assume the documented one-arg contract
            pass
        return fetcher(path)
    import random

    return random.choice(
        _LOCAL_PROMPTS.get(prompt_type, _LOCAL_PROMPTS["景觀"])
    )


def get_chosen_image(choice: int, output_dir: str = "output_images") -> bytes:
    """Return the super-resolved latent output `choice` as PNG bytes
    (reference anvil_utils.py:68-72 returns BlobMedia of sr/latent_N.png)."""
    path = os.path.join(output_dir, "latent", "sr", f"latent_{choice}.png")
    if not os.path.exists(path):
        path = os.path.join(output_dir, "latent", f"latent_{choice}.png")
    with open(path, "rb") as f:
        return f.read()


@dataclasses.dataclass
class AnalysisBank:
    """Per-CLIP-model style/media embedding banks for analyze_image
    (reference data/: styles.csv 397 rows, media.csv 95 rows with
    per-model embeddings; anvil_utils.py:19-33)."""

    styles: Dict[str, "np.ndarray"]  # model name -> (N, D)
    media: Dict[str, "np.ndarray"]
    style_names: List[str]
    media_names: List[str]


def analyze_image(
    image01: np.ndarray,
    clip_embed_fns: Dict[str, callable],
    bank: AnalysisBank,
    top_k: int = 3,
    resolution: int = 224,
) -> Dict[str, List[Tuple[float, str]]]:
    """CLIP image analysis: top-3 styles/media by inner product of the
    L2-normalized image embedding (reference anvil_utils.py:75-95; analysis
    uses ViT-B/16 + ViT-L/14 only — pass just those embed fns; both are
    224-px towers, `resolution` overrides for test doubles)."""
    from clip_diffusion_tpu.guidance.losses import l2_normalize
    from clip_diffusion_tpu.models.clip.model import clip_normalize
    from clip_diffusion_tpu.ops.resize import resize_center_crop
    from clip_diffusion_tpu.text.retrieval import EmbeddingIndex

    img = jnp.asarray(image01, jnp.float32)
    # resize-shorter-side + center-crop, matching the reference's
    # CLIP_PREPROCESS (reference functional.py:19-26) so embeddings agree
    # on non-square inputs
    square = resize_center_crop(img, resolution)
    results: Dict[str, List[Tuple[float, str]]] = {"styles": [], "media": []}
    agg_styles = {}
    agg_media = {}
    for name, embed in clip_embed_fns.items():
        emb = embed(clip_normalize(square[None]))
        emb = np.asarray(l2_normalize(emb, axis=-1))
        for kind, banks, names, agg in (
            ("styles", bank.styles, bank.style_names, agg_styles),
            ("media", bank.media, bank.media_names, agg_media),
        ):
            if name not in banks:
                continue
            scores, idx = EmbeddingIndex(banks[name]).search(emb, top_k)
            for s, i in zip(scores[0], idx[0]):
                agg.setdefault(names[i], []).append(float(s))
    for kind, agg in (("styles", agg_styles), ("media", agg_media)):
        ranked = sorted(
            ((float(np.mean(v)), k) for k, v in agg.items()), reverse=True
        )[:top_k]
        results[kind] = [(round(100 * s, 2), n) for s, n in ranked]
    return results


def load_analysis_bank(data_dir: str = None,
                       models: Sequence[str] = ("ViT-B/16", "ViT-L/14")):
    """Load styles/media banks produced by tools/build_banks.py:
    <dir>/{styles,media}_<model>.npy + {styles,media}_names.txt.
    Defaults to the shipped data/banks (carried reference keyword lists,
    see data/README.md).  Returns None if the directory has no banks."""
    import numpy as np

    if data_dir is None:
        from clip_diffusion_tpu.text.prompt import DATA_ROOT

        data_dir = os.path.join(DATA_ROOT, "banks")

    def read_names(kind):
        path = os.path.join(data_dir, f"{kind}_names.txt")
        if not os.path.exists(path):
            return None
        with open(path, encoding="utf-8") as f:
            return [line.strip() for line in f if line.strip()]

    style_names = read_names("styles")
    media_names = read_names("media")
    if style_names is None and media_names is None:
        return None
    styles, media = {}, {}
    for name in models:
        tag = name.replace("/", "_")
        for kind, target in (("styles", styles), ("media", media)):
            path = os.path.join(data_dir, f"{kind}_{tag}.npy")
            if os.path.exists(path):
                target[name] = np.load(path)
    return AnalysisBank(
        styles=styles,
        media=media,
        style_names=style_names or [],
        media_names=media_names or [],
    )


def make_analyzer(models, bank: "AnalysisBank" = None,
                  model_names: Sequence[str] = ("ViT-B/16", "ViT-L/14")):
    """Default `analyze_image` closure for runtime/server.py: the zoo's CLIP
    towers (analysis uses ViT-B/16 + ViT-L/14, reference anvil_utils.py:
    28-33,75-95) + the shipped style/media banks.  Returns None if neither
    a bank nor the default data assets exist.

    The jitted embed functions are constructed ONCE here — on this remote-
    compile backend a per-request `jax.jit(<fresh lambda>)` would retrace
    and recompile both towers on every analysis call."""
    from clip_diffusion_tpu.models.clip.model import CLIPModel

    bank = bank or load_analysis_bank()
    if bank is None:
        return None
    embed_fns = {}
    resolution = None
    for name in model_names:
        if name not in models.clips:
            continue
        model, params = models.clips[name]
        res = getattr(getattr(model, "cfg", None), "image_resolution", 224)
        if resolution is None:
            resolution = res
        elif res != resolution:
            # analyze_image preprocesses ONE square for all towers
            raise ValueError(
                f"analysis towers disagree on input resolution "
                f"({resolution} vs {res} for {name}); pass same-size towers"
            )
        jfn = jax.jit(
            lambda p, im, m=model: m.apply(
                p, im, method=CLIPModel.encode_image
            )
        )
        embed_fns[name] = lambda im, f=jfn, p=params: f(p, im)
    if not embed_fns:
        return None
    return lambda image01, top_k=3: analyze_image(
        image01, embed_fns, bank, top_k, resolution or 224
    )


# --------------------------------------------------------------------------
# Pod-sharded batch generation
# --------------------------------------------------------------------------

def serve_guided_batch(
    pipe,
    params,
    prompts_count: int,
    seeds_per_prompt: int,
    base_seed: int = 0,
    mesh=None,
):
    """Run `prompts_count x seeds_per_prompt` guided generations as one
    sharded batch over the (prompt, seed) mesh (BASELINE config 5: 8
    distinct prompts x 4 seeds).

    Heterogeneous prompts: build the pipeline with a LIST of per-prompt
    (text, weight) lists (zoo.build_pipeline) so each perceptor's
    text_embeddings is (prompts_count, Pmax, D); rows are repeated
    seeds_per_prompt times here, giving every batch element its own prompt
    while seeds fan out within a prompt.  2-D embeddings (one shared prompt)
    keep the round-1 replicated behavior.

    Sizing: one image per chip is optimal for multi-tower guided configs
    (per-chip batching is a measured per-image loss there); single-small-
    tower configs are the exception — 256² ViT-B/32-only peaks at per-chip
    batch 8 (+26% img/min, STATUS.md batch study), so such deployments
    should pass prompts_count x seeds_per_prompt ≈ 8 x n_devices."""
    from clip_diffusion_tpu.pipeline.guided import guided_sample

    mesh = mesh or make_mesh()
    batch = prompts_count * seeds_per_prompt
    # commit every host-side input up front, exactly like serve_latent_batch:
    # jit's implicit replication of an uncommitted input is an all-reduce
    # broadcast that can abort a fake-mesh dryrun on a slow host
    # (parallel/mesh.replicate_collective_free).  `params` placement stays
    # the caller's — serving processes pre-replicate big trees once — but
    # the per-prompt rows built HERE are committed batch-sharded so the
    # pod program stays collective-free end to end.
    out_sh = batch_sharding(mesh)
    key = replicate_collective_free(
        np.asarray(jax.random.PRNGKey(base_seed)), mesh
    )

    te0 = params["perceptors"][0]["text_embeddings"]
    if getattr(te0, "ndim", 2) == 3:
        if te0.shape[0] != prompts_count:
            raise ValueError(
                f"params carry {te0.shape[0]} prompts, expected {prompts_count}"
            )
        params = dict(params)
        params["perceptors"] = [
            {
                **pp,
                "text_embeddings": jax.device_put(
                    np.repeat(
                        np.asarray(pp["text_embeddings"]),
                        seeds_per_prompt,
                        axis=0,
                    ),
                    out_sh,
                ),
                "text_weights": jax.device_put(
                    np.repeat(
                        np.asarray(pp["text_weights"]), seeds_per_prompt, axis=0
                    ),
                    out_sh,
                ),
            }
            for pp in params["perceptors"]
        ]
    final, frames = jax.jit(
        lambda p, k: guided_sample(pipe, p, k, batch_size=batch),
        out_shardings=(out_sh, None),
    )(params, key)
    return final, frames


def serve_latent_batch(
    pipe,
    params,
    context_cond,
    context_uncond=None,
    seeds_per_prompt: int = 1,
    base_seed: int = 0,
    mesh=None,
    height: int = 256,
    width: int = 256,
    steps: int = 50,
    guidance_scale: float = 5.0,
    eta: float = 0.0,
    mode: str = "ddim",
    decode: bool = True,
):
    """Pod-parallel latent sampling: N prompts x M seeds as ONE mesh-sharded
    CFG program — the latent analog of `serve_guided_batch`.

    The reference's latent batching lives entirely on one device
    (reference sample.py:410-421 passes batch_size into sampler.sample);
    here the batch axis is sharded over the (prompt, seed) mesh so a pod
    serves N·M images per dispatch with zero hot-loop collectives (the CFG
    scan touches only its own batch shard; parameters are replicated).

    context_cond: (n_prompts, T, D) per-prompt text conditioning (a 2-D
    (T, D) array means one prompt); rows are repeated seeds_per_prompt
    times, seeds fanning out within a prompt exactly like
    serve_guided_batch.  context_uncond: (1|n_prompts, T, D) empty-string
    conditioning for CFG, or None to disable CFG.  Returns decoded [0,1]
    pixels (B, H, W, 3) when `decode`, else latents (B, h, w, C), batch
    axis sharded over the mesh.

    Sizing: unlike guided sampling (per-chip batching is a per-image LOSS,
    see STATUS.md), the latent UNet at 32x32 latents underfills the MXU at
    small batch — measured 256^2 DDIM-50 warm steady state on one v5e
    chip (chunk-timed, incl. VQ decode): 129 img/min at per-chip batch 1
    → 222 at batch 3 → 316 at batch 12 (saturating ~9-12).  Choose
    N*M ≈ 9-12 × n_devices for peak throughput; latency-critical
    requests can stay at batch = n_devices.
    """
    mesh = mesh or make_mesh()
    ctx_c = jnp.asarray(context_cond)
    if ctx_c.ndim == 2:
        ctx_c = ctx_c[None]
    n_prompts = ctx_c.shape[0]
    batch = n_prompts * seeds_per_prompt
    ctx_c = jnp.repeat(ctx_c, seeds_per_prompt, axis=0)

    use_cfg = context_uncond is not None and guidance_scale > 0
    if use_cfg:
        ctx_u = jnp.asarray(context_uncond)
        if ctx_u.ndim == 2:
            ctx_u = ctx_u[None]
        if ctx_u.shape[0] == 1:
            ctx_u = jnp.broadcast_to(ctx_u, (batch,) + ctx_u.shape[1:])
        elif ctx_u.shape[0] == n_prompts:
            ctx_u = jnp.repeat(ctx_u, seeds_per_prompt, axis=0)
        elif ctx_u.shape[0] != batch:
            raise ValueError(
                f"context_uncond carries {ctx_u.shape[0]} rows; expected "
                f"1, {n_prompts} (per prompt) or {batch} (per image)"
            )
    else:
        ctx_u = jnp.zeros_like(ctx_c)

    # commit the small host-side inputs up front: the batch-sharded
    # contexts are plain host→device slice copies, and the replicated key
    # goes through the collective-free path — jit's implicit replication
    # of an uncommitted input is an all-reduce broadcast that can abort a
    # fake-mesh dryrun on a slow host (parallel/mesh.
    # replicate_collective_free).  `params` placement stays the caller's:
    # serving processes pre-replicate big trees once.
    bsh = batch_sharding(mesh)
    ctx_c = jax.device_put(np.asarray(ctx_c), bsh)
    ctx_u = jax.device_put(np.asarray(ctx_u), bsh)
    key = replicate_collective_free(
        np.asarray(jax.random.PRNGKey(base_seed)), mesh
    )
    run = _jit_latent_serve(
        pipe, mesh, use_cfg, batch, height, width, steps,
        guidance_scale, eta, mode, decode,
    )
    return run(params, ctx_c, ctx_u, key)


_LATENT_SERVE_CACHE = weakref.WeakKeyDictionary()


def _jit_latent_serve(pipe, mesh, use_cfg, batch, height, width, steps,
                      guidance_scale, eta, mode, decode):
    """One compiled pod program per (pipe, mesh, geometry) — a fresh
    closure per request would defeat jit's executable cache and re-trace
    (and, in a server process, remote-recompile) the full CFG scan + VQ
    decode on EVERY call.

    The cache is WEAKLY keyed on the pipe: LatentPipeline's callable
    fields are fresh lambdas per zoo.build_latent_pipeline call, so two
    builds of the same models never compare equal — an unbounded
    lru_cache would both miss on every rebuilt pipe AND pin each dead
    pipe's compiled LDM executables forever.  Build the pipeline ONCE per
    process (every in-repo caller does: sample.py's _LATENT_STACK_CACHE,
    bootstrap, bench) — a per-request rebuild re-traces here exactly as it
    would under raw jit."""
    knobs = (mesh, use_cfg, batch, height, width, steps,
             guidance_scale, eta, mode, decode)
    per_pipe = _LATENT_SERVE_CACHE.setdefault(pipe, {})
    if knobs in per_pipe:
        return per_pipe[knobs]
    run = _build_latent_serve(pipe, mesh, use_cfg, batch, height, width,
                              steps, guidance_scale, eta, mode, decode)
    per_pipe[knobs] = run
    return run


def _build_latent_serve(pipe, mesh, use_cfg, batch, height, width, steps,
                        guidance_scale, eta, mode, decode):
    from clip_diffusion_tpu.pipeline.latent import decode_latents, latent_sample

    def run(p, c, u, k):
        z = latent_sample(
            pipe, p, k, c, u if use_cfg else None,
            batch_size=batch, height=height, width=width, steps=steps,
            guidance_scale=guidance_scale, eta=eta, mode=mode,
        )
        if decode:
            return decode_latents(pipe, p["vq"], z)
        return z

    return jax.jit(run, out_shardings=batch_sharding(mesh))
