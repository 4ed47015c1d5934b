"""Pipeline factory: assemble the flagship guided pipeline from the model
zoo.

Mirrors the reference's loader layer (reference models.py:74-240 +
sample.py:52-56 module-load): pick CLIP perceptors by name, build the ADM
UNet for the configured canvas, attach aesthetic heads, embed the prompt per
perceptor.  Checkpoints load through models/convert.py when available;
otherwise parameters are randomly initialized (identical program/FLOPs — how
benches and tests run in this zero-egress environment).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import warnings
import zlib
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.config import Config
from clip_diffusion_tpu.diffusion.sampling import SamplerConfig
from clip_diffusion_tpu.diffusion.schedule import make_schedule
from clip_diffusion_tpu.models.aesthetic import CLIP_DIMS, make_aesthetic_predictor
from clip_diffusion_tpu.models.clip import (
    CLIP_PRESETS,
    CLIPModel,
    tokenize,
)
from clip_diffusion_tpu.models.unet import UNetConfig, UNetModel
from clip_diffusion_tpu.pipeline.guided import GuidedPipeline, Perceptor


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


@dataclasses.dataclass
class ZooModels:
    """Initialized models + params, reusable across prompts/requests."""

    unet: UNetModel
    unet_params: dict
    clips: Dict[str, Tuple[CLIPModel, dict]]
    aesthetic: Dict[str, Tuple[object, dict]]
    # (LPIPS module, params) — the reference's module-level lpips.LPIPS("vgg")
    # singleton (reference sample.py:52); None when init-image losses are off
    lpips: Optional[Tuple[object, dict]] = None


def _host_init(init_fn, *args, param_dtype=jnp.bfloat16, seed: int = 0):
    """Random-init parameters HOST-SIDE as numpy and let jit transfer them
    to the accelerator once.  On-device init of a 552M-param tree through
    this environment's TPU tunnel costs minutes (hundreds of tiny RNG
    dispatches); shape-eval + one vectorized host RNG pass costs seconds."""
    shapes = jax.eval_shape(init_fn, *args)
    rng = np.random.default_rng(seed)
    paths, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    out = []
    for path, leaf in paths:
        name = str(getattr(path[-1], "key", ""))
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            out.append(np.zeros(leaf.shape, leaf.dtype))
        elif name in ("scale",) or "var" in name:
            out.append(np.ones(leaf.shape, param_dtype))
        elif name in ("bias", "mean"):
            out.append(np.zeros(leaf.shape, param_dtype))
        else:
            fan_in = int(np.prod(leaf.shape[:-1])) or 1
            arr = rng.normal(0.0, 1.0 / np.sqrt(fan_in), leaf.shape)
            out.append(np.asarray(arr, dtype=param_dtype))
    tree = jax.tree_util.tree_unflatten(treedef, out)
    # commit to device ONCE: numpy leaves as jit arguments are re-uploaded
    # on every call (host->device of the full parameter set per step)
    return jax.device_put(tree)


# converted-checkpoint root (written by tools/fetch_and_convert.py); the
# reference's analog is its models/ download cache (reference models.py:41-64)
FLAX_ROOT_ENV = "CLIP_DIFFUSION_FLAX"
DEFAULT_FLAX_ROOT = os.path.join("models", "flax")


def checkpoint_dir(name: str, root: Optional[str] = None) -> Optional[str]:
    """Path of a converted orbax checkpoint if provisioned, else None."""
    root = root or os.environ.get(FLAX_ROOT_ENV, DEFAULT_FLAX_ROOT)
    path = os.path.abspath(os.path.join(root, name))
    return path if os.path.isdir(path) else None


# which weight trees this process actually served: converted checkpoints vs
# random-init stand-ins.  Quality artifacts (CLIP scores) are only
# reference-comparable when everything loaded from converted weights AND the
# real BPE table is present — bench.py/tools/clip_score.py flag their output
# with this so a stand-in run can never masquerade as a parity measurement
# (VERDICT r3 item 5 / ADVICE r3).
_PROVENANCE = {"loaded": set(), "random_init": set()}


def weights_provenance() -> dict:
    """Provenance of every tree load_or_init served in this process, plus
    tokenizer reality, rolled into a reference_comparable verdict."""
    from clip_diffusion_tpu.models.clip.tokenizer import (
        default_bpe_path,
        get_tokenizer,
    )

    if get_tokenizer.cache_info().currsize:
        real_bpe = type(get_tokenizer()).__name__ == "SimpleTokenizer"
    else:  # nothing tokenized yet — report what WOULD be used
        real_bpe = default_bpe_path() is not None
    random_init = sorted(_PROVENANCE["random_init"])
    return {
        "weights": (
            "converted" if not random_init
            else "random-init stand-in (not reference-comparable)"
        ),
        "tokenizer": "real-bpe" if real_bpe else "hash-standin",
        "random_init": random_init,
        "loaded": sorted(_PROVENANCE["loaded"]),
        "reference_comparable": not random_init and real_bpe,
    }


def load_or_init(name: str, init_fn, *args, param_dtype=jnp.bfloat16,
                 seed: int = 0, root: Optional[str] = None):
    """Load the converted checkpoint `models/flax/<name>` when present
    (structure+shape validated against the model's init template), else
    host-random-init — the single gate every zoo builder goes through, so
    `fetch_and_convert.py` output is picked up everywhere (the reference's
    load layer, models.py:41-64).  Parameters land on device ONCE either
    way (see _host_init).

    Failure policy: an ABSENT checkpoint initializes (that is the
    zero-egress default); a PRESENT checkpoint that fails to read or
    validate RAISES — a provisioned deployment must never silently serve
    random weights because a tree was corrupted (the serving registry
    enforces the same, runtime/registry.py).  Set
    CLIP_DIFFUSION_TPU_LENIENT_LOAD=1 to restore warn-and-init (tests /
    scratch environments with half-written trees)."""
    path = checkpoint_dir(name, root)
    if path is not None:
        lenient = bool(os.environ.get("CLIP_DIFFUSION_TPU_LENIENT_LOAD"))
        try:
            from clip_diffusion_tpu.utils.checkpoint import (
                load_validated_params,
            )

            loaded = load_validated_params(
                path, jax.eval_shape(init_fn, *args), param_dtype, name
            )
            _PROVENANCE["loaded"].add(name)
            return loaded
        except Exception as e:  # noqa: BLE001 — any IO/format problem
            if not lenient:
                raise RuntimeError(
                    f"checkpoint {path} is present but unusable ({e!r}); "
                    "refusing to serve random init — remove the directory "
                    "to run from init, or set "
                    "CLIP_DIFFUSION_TPU_LENIENT_LOAD=1"
                ) from e
            warnings.warn(f"failed to load checkpoint {path}: {e!r}; "
                          "falling back to random init (lenient mode)")
    _PROVENANCE["random_init"].add(name)
    return _host_init(init_fn, *args, param_dtype=param_dtype, seed=seed)


def clip_checkpoint_name(model_name: str) -> str:
    return f"clip_{model_name.replace('/', '_')}"


def load_or_init_clip(model_name: str, param_dtype=jnp.bfloat16,
                      seed: int = 0, root: Optional[str] = None):
    """(CLIPModel, params) for one perceptor — converted OpenAI weights when
    provisioned, else a deterministic init whose seed depends only on the
    MODEL NAME (not the caller's loop position), so serving towers
    (build_models) and bank towers (tools/build_banks.py) are always the
    same tower and analyze_image / auto-modifier rankings stay consistent
    even in unprovisioned test environments."""
    ccfg = dataclasses.replace(CLIP_PRESETS[model_name], dtype=param_dtype)
    model = CLIPModel(ccfg)
    name_seed = seed + (zlib.crc32(model_name.encode()) % 100000)
    params = load_or_init(
        clip_checkpoint_name(model_name),
        lambda: model.init(
            jax.random.PRNGKey(name_seed),
            jnp.ones((1, ccfg.image_resolution, ccfg.image_resolution, 3)),
            jnp.ones((1, 77), jnp.int32),
        ),
        param_dtype=param_dtype, seed=name_seed, root=root,
    )
    return model, params


def build_lpips(param_dtype=jnp.float32, seed: int = 1000,
                checkpoint_root=None):
    """(LPIPS module, params) — loads the converted `lpips_vgg` checkpoint
    (models/lpips.convert_lpips[_parts] via fetch_and_convert --lpips) when
    provisioned."""
    from clip_diffusion_tpu.models.lpips import LPIPS

    model = LPIPS(dtype=param_dtype)
    params = load_or_init(
        "lpips_vgg",
        lambda: model.init(
            jax.random.PRNGKey(seed),
            jnp.ones((1, 64, 64, 3)),
            jnp.ones((1, 64, 64, 3)),
        ),
        param_dtype=param_dtype, seed=seed, root=checkpoint_root,
    )
    return model, params


def build_esrgan(scale: int = 4, param_dtype=jnp.float32, seed: int = 2000,
                 tiny: bool = False, checkpoint_root=None):
    """(RRDBNet, params) — the Real-ESRGAN upsampler (reference
    models.py:153-174), loading the converted `esrgan_x{scale}` checkpoint
    when provisioned."""
    from clip_diffusion_tpu.models.esrgan import RRDBNet

    model = RRDBNet(scale=scale, dtype=param_dtype) if not tiny else RRDBNet(
        scale=scale, num_feat=16, num_block=2, num_grow_ch=8,
        dtype=param_dtype,
    )
    init_fn = lambda: model.init(
        jax.random.PRNGKey(seed), jnp.ones((1, 32, 32, 3))
    )
    if tiny and checkpoint_root is None:
        params = _host_init(init_fn, param_dtype=param_dtype, seed=seed)
    else:
        params = load_or_init(f"esrgan_x{scale}", init_fn,
                              param_dtype=param_dtype, seed=seed,
                              root=checkpoint_root)
    return model, params


def build_models(
    config: Config,
    image_size: int = 512,
    param_dtype=jnp.bfloat16,
    seed: int = 0,
    with_aesthetic: bool = False,
    with_lpips: bool = False,
    checkpoint_root: Optional[str] = None,
    unet_config: Optional[UNetConfig] = None,
) -> ZooModels:
    """Build the flagship model set, loading converted checkpoints from
    models/flax/ when provisioned (see load_or_init) and falling back to
    host-side random init (how benches/tests run in this zero-egress
    environment — identical program/FLOPs either way).

    `unet_config` overrides the ADM architecture while keeping the
    `guided_unet_{image_size}` checkpoint slot — how custom finetuned UNets
    with non-default shapes (reference sample.py:97-99 custom_model_path)
    and the deploy-path e2e test load."""
    key = jax.random.PRNGKey(seed)
    ucfg = unet_config or UNetConfig.for_image_size(image_size)
    unet = UNetModel(ucfg)
    uparams = load_or_init(
        f"guided_unet_{image_size}",
        lambda: unet.init(key, jnp.ones((1, 64, 64, 3)), jnp.zeros((1,))),
        param_dtype=param_dtype, seed=seed, root=checkpoint_root,
    )

    clips = {}
    aesthetic = {}
    for i, name in enumerate(config.chosen_clip_models):
        # compute dtype must match the param dtype: a mismatch makes XLA
        # upcast the full parameter set on every forward
        model, params = load_or_init_clip(name, param_dtype=param_dtype,
                                          seed=seed, root=checkpoint_root)
        clips[name] = (model, params)
        if with_aesthetic and name in config.chosen_predictors and name in CLIP_DIMS:
            head = make_aesthetic_predictor(name)
            hp = load_or_init(
                f"aesthetic_{name.replace('/', '_')}",
                lambda h=head, n=name: h.init(
                    jax.random.fold_in(key, 100 + i),
                    jnp.ones((1, CLIP_DIMS[n])),
                ),
                param_dtype=jnp.float32, seed=seed + 100 + i,
                root=checkpoint_root,
            )
            aesthetic[name] = (head, hp)
    lpips = (build_lpips(seed=seed + 1000, checkpoint_root=checkpoint_root)
             if with_lpips else None)
    return ZooModels(unet, uparams, clips, aesthetic, lpips)


@functools.lru_cache(maxsize=None)
def _jit_encode_text(model):
    """One compiled text-tower program per CLIP model (flax Modules are
    frozen dataclasses, hence hashable).  build_pipeline runs per REQUEST
    in serving; an un-jitted apply executes op-by-op — hundreds of
    round-trips on a remote-attached backend."""
    return jax.jit(
        lambda p, t: model.apply(p, t, method=CLIPModel.encode_text)
    )


def build_pipeline(
    models: ZooModels,
    config: Config,
    prompts: Sequence[Tuple[str, float]],
    sampler: SamplerConfig,
    lpips_fn=None,
    use_init_losses: bool = False,
):
    """Wire prompt embeddings + perceptors into (GuidedPipeline, params).

    `prompts`: (text, weight) pairs — the reference's "text:weight" syntax
    parsed upstream (reference prompt.py:80-85, preprocessing.py:11-24) —
    shared by every image in the batch; OR a list of such lists, one per
    image (heterogeneous-prompt pod serving, BASELINE config 5): per-
    perceptor text embeddings then carry a leading batch axis (B, Pmax, D)
    with zero-weight padding terms.

    Returns the static pipeline plus the GuidedParams pytree that must be
    passed through jit as an ARGUMENT (see pipeline/guided.py docstring)."""
    batched = bool(prompts) and not isinstance(prompts[0][0], str)
    if batched:
        pmax = max(len(p) for p in prompts)
        texts = [t for p in prompts for t, _ in p]
        weights = np.zeros((len(prompts), pmax), np.float32)
        for i, p in enumerate(prompts):
            weights[i, : len(p)] = [w for _, w in p]
            if abs(weights[i]).sum() < 1e-3:
                raise RuntimeError("The text_weights must not sum to 0.")
        weights = jnp.asarray(weights)
        offsets = np.cumsum([0] + [len(p) for p in prompts])
    else:
        texts = [t for t, _ in prompts]
        weights = jnp.asarray([w for _, w in prompts], jnp.float32)
        if float(jnp.abs(weights).sum()) < 1e-3:
            raise RuntimeError("The text_weights must not sum to 0.")
    toks = jnp.asarray(tokenize(texts))

    perceptors = []
    perceptor_params = []
    for name, (model, params) in models.clips.items():
        text_emb = _jit_encode_text(model)(params, toks)
        if batched:
            # (sum P_i, D) -> padded (B, Pmax, D); pad rows are zero vectors
            # with zero weight (they contribute nothing to the loss)
            emb = np.zeros((len(prompts), pmax, text_emb.shape[-1]),
                           np.float32)
            for i in range(len(prompts)):
                emb[i, : offsets[i + 1] - offsets[i]] = np.asarray(
                    text_emb[offsets[i] : offsets[i + 1]], np.float32
                )
            text_emb = jnp.asarray(emb)
        aes_fn = None
        aes_params = ()
        if name in models.aesthetic:
            head, hp = models.aesthetic[name]
            aes_fn = lambda p, e, h=head: h.apply(p, e)
            aes_params = hp
        perceptors.append(
            Perceptor(
                name=name,
                embed_image=lambda p, im, m=model: m.apply(
                    p, im, method=CLIPModel.encode_image
                ),
                input_resolution=CLIP_PRESETS[name].image_resolution,
                aesthetic_fn=aes_fn,
            )
        )
        perceptor_params.append(
            {
                "clip": params,
                "aesthetic": aes_params,
                "text_embeddings": text_emb,
                "text_weights": weights,
            }
        )

    lpips_params = ()
    if lpips_fn is None and models.lpips is not None:
        lpips_model, lpips_params = models.lpips
        lpips_fn = lambda p, x, y, m=lpips_model: m.apply(p, x, y)

    pipe = GuidedPipeline(
        unet_apply=lambda p, x, t, mod=models.unet: mod.apply(p, x, t),
        perceptors=tuple(perceptors),
        config=config,
        sampler=sampler,
        schedule=make_schedule(steps=sampler.steps),
        lpips_fn=lpips_fn,
        use_init_losses=use_init_losses,
    )
    params = {
        "unet": models.unet_params,
        "perceptors": perceptor_params,
        "lpips": lpips_params,
    }
    return pipe, params


@dataclasses.dataclass
class LatentModels:
    """The LDM stack (reference models.py:134-150): cross-attention UNet +
    VQ-f8 first stage + BERT text encoder, with params."""

    unet: object
    unet_params: dict
    vq: object
    vq_params: dict
    bert: object
    bert_params: dict


def build_latent_models(param_dtype=jnp.bfloat16, seed: int = 0,
                        tiny: bool = False,
                        checkpoint_root=None) -> LatentModels:
    """Build the LDM txt2img-f8-large stack, loading the converted
    `ldm_{unet,vq,bert}` checkpoints (fetch_and_convert --ldm ->
    models/ldm/convert.convert_ldm_checkpoint) when provisioned, else
    host random init.  `tiny` skips the load gates (test-double shapes
    never match real checkpoints)."""
    from clip_diffusion_tpu.models.ldm import (
        BERTConfig,
        BERTEmbedder,
        LDMUNet,
        LDMUNetConfig,
        VQConfig,
        VQModel,
    )

    ucfg = LDMUNetConfig.tiny() if tiny else LDMUNetConfig()
    vcfg = VQConfig.tiny() if tiny else VQConfig()
    bcfg = BERTConfig.tiny() if tiny else BERTConfig()
    # tiny BERT width must match the tiny UNet context dim
    if tiny:
        bcfg = dataclasses.replace(bcfg, n_embed=ucfg.context_dim)

    def gate(name, init_fn, dtype, s):
        # tiny test doubles skip the gate (their shapes never match real
        # checkpoints) unless a root is passed explicitly (the deploy-path
        # e2e test converts tiny-shaped checkpoints into its own root)
        if tiny and checkpoint_root is None:
            return _host_init(init_fn, param_dtype=dtype, seed=s)
        return load_or_init(name, init_fn, param_dtype=dtype, seed=s,
                            root=checkpoint_root)

    unet = LDMUNet(ucfg)
    unet_params = gate(
        "ldm_unet",
        lambda: unet.init(
            jax.random.PRNGKey(seed),
            jnp.ones((1, 8, 8, ucfg.in_channels)),
            jnp.zeros((1,)),
            jnp.ones((1, 4, ucfg.context_dim)),
        ),
        param_dtype, seed,
    )
    vq = VQModel(vcfg)
    vq_params = gate(
        "ldm_vq",
        lambda: vq.init(
            jax.random.PRNGKey(seed + 1),
            jnp.ones((1, vcfg.resolution, vcfg.resolution, 3)),
        ),
        jnp.float32, seed + 1,
    )
    bert = BERTEmbedder(bcfg)
    bert_params = gate(
        "ldm_bert",
        lambda: bert.init(
            jax.random.PRNGKey(seed + 2), jnp.ones((1, 77), jnp.int32)
        ),
        param_dtype, seed + 2,
    )
    return LatentModels(unet, unet_params, vq, vq_params, bert, bert_params)


def build_latent_pipeline(models: LatentModels):
    """(LatentPipeline, params, text_encode) — params is the pytree passed
    through jit as an argument (see pipeline/guided.py docstring)."""
    from clip_diffusion_tpu.models.ldm.autoencoder import VQModel
    from clip_diffusion_tpu.models.ldm.bert import bert_tokenize
    from clip_diffusion_tpu.pipeline.latent import LatentPipeline

    downsample = 2 ** (len(models.vq.cfg.ch_mult) - 1)
    unet_mod, vq_mod, bert_mod = models.unet, models.vq, models.bert
    pipe = LatentPipeline(
        # unet_apply always runs inside latent_sample's jitted scan; decode/
        # encode are ALSO called eagerly (bench, sample.py img2img) where an
        # un-jitted apply executes op-by-op — hundreds of dispatches through
        # the remote relay (~0.7-1.4 s measured) vs one 32 ms program jitted
        unet_apply=lambda p, x, t, c: unet_mod.apply(p, x, t, c),
        decode=jax.jit(lambda p, z: vq_mod.apply(p, z, method=VQModel.decode)),
        encode=jax.jit(lambda p, x: vq_mod.apply(p, x, method=VQModel.encode)),
        latent_channels=models.vq.cfg.embed_dim,
        downsample=downsample,
    )
    params = {"unet": models.unet_params, "vq": models.vq_params,
              "bert": models.bert_params}
    bert_apply = jax.jit(bert_mod.apply)  # jit once: re-wrapping per call
    # would re-trace the encoder on every prompt

    def text_encode(texts, _p=params):
        toks = jnp.asarray(bert_tokenize(texts))
        return bert_apply(_p["bert"], toks)

    return pipe, params, text_encode
