"""Deploy-path end-to-end: fetch -> convert -> save -> zoo-load -> sample.

VERDICT r2 item 1 "done" criterion: a mock-networked test (file:// URLs over
tiny torch state dicts with the EXACT reference key naming) drives
tools/fetch_and_convert.py's main() and then proves zoo builders LOAD the
converted artifacts (leaf-for-leaf, so a silent random-init fallback fails
the test) and the loaded stacks SAMPLE finite images — for every model
family the reference deploys from checkpoints (reference models.py:41-240):
ADM guided UNet, CLIP, the LDM stack, Real-ESRGAN, aesthetic heads, LPIPS.

Marian/T5 fetch through `transformers` (no URL to mock); their load-or-init
gates are covered by tests/test_marian.py and tests/test_t5.py.

Torch oracles are reused from test_convert_full.py / test_convert_ldm.py.
"""

import dataclasses
import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_convert_full import TorchADMUNet, TorchCLIP
from test_convert_full import _randomize as _randomize_adm
from test_convert_ldm import TorchBERT, TorchLDMUNet, TorchVQ, _randomize

import tools.fetch_and_convert as fc
from clip_diffusion_tpu import zoo
from clip_diffusion_tpu.models.clip import CLIP_PRESETS, tiny_clip_config
from clip_diffusion_tpu.models.ldm.bert import BERTConfig
from clip_diffusion_tpu.models.ldm.autoencoder import VQConfig
from clip_diffusion_tpu.models.ldm.unet import LDMUNetConfig
from clip_diffusion_tpu.models.unet import UNetConfig
from clip_diffusion_tpu.tests_support import tiny_config


@pytest.fixture
def deploy_env(tmp_path, monkeypatch):
    """Point fetch_and_convert's download cache + flax output at a tmp dir."""
    model_dir = tmp_path / "models"
    flax_dir = model_dir / "flax"
    monkeypatch.setattr(fc, "MODEL_DIR", str(model_dir))
    monkeypatch.setattr(fc, "FLAX_DIR", str(flax_dir))
    return tmp_path, str(flax_dir)


def _serve(tmp_path, fname: str, obj) -> str:
    """torch.save `obj` and return its file:// URL (the mock network)."""
    src = tmp_path / "upstream" / fname
    src.parent.mkdir(exist_ok=True)
    torch.save(obj, src)
    return pathlib.Path(src).as_uri()


def _first_leaf(tree):
    return np.asarray(jax.tree_util.tree_leaves(tree)[0])


def _assert_loaded(loaded_tree, converted_tree):
    """Leaf-for-leaf equality: proves the gate LOADED (not random-init)."""
    got = jax.tree_util.tree_leaves(loaded_tree)
    want = jax.tree_util.tree_leaves(converted_tree)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32), atol=1e-6
        )


# --------------------------------------------------------------------------
# LDM stack: one CompVis-style ckpt -> ldm_unet + ldm_vq + ldm_bert -> sample
# --------------------------------------------------------------------------

def test_deploy_ldm_stack(deploy_env, monkeypatch):
    tmp_path, flax_root = deploy_env
    # the exact configs build_latent_models(tiny=True) constructs
    ucfg = LDMUNetConfig.tiny()
    vcfg = VQConfig.tiny()
    bcfg = dataclasses.replace(BERTConfig.tiny(), n_embed=ucfg.context_dim)

    sd = {}
    for k, v in _randomize(TorchLDMUNet(ucfg), seed=1).state_dict().items():
        sd[f"model.diffusion_model.{k}"] = v
    for k, v in _randomize(TorchVQ(vcfg), seed=2).state_dict().items():
        sd[f"first_stage_model.{k}"] = v
    for k, v in _randomize(TorchBERT(bcfg), seed=3).state_dict().items():
        sd[f"cond_stage_model.transformer.{k}"] = v
    url = _serve(tmp_path, "tiny-ldm.ckpt", {"state_dict": sd})
    monkeypatch.setitem(fc.ARTIFACTS, "ldm", (url, "tiny-ldm.ckpt"))

    fc.main(["--ldm"])

    models = zoo.build_latent_models(
        tiny=True, param_dtype=jnp.float32, checkpoint_root=flax_root
    )
    from clip_diffusion_tpu.models.ldm.convert import convert_ldm_checkpoint

    trees = convert_ldm_checkpoint({k: v.numpy() for k, v in sd.items()})
    _assert_loaded(models.unet_params, trees["unet"])
    _assert_loaded(models.vq_params, trees["vq"])
    _assert_loaded(models.bert_params, trees["bert"])

    # ... and the loaded stack samples finite pixels end-to-end
    from clip_diffusion_tpu.pipeline.latent import decode_latents, latent_sample

    pipe, params, text_encode = zoo.build_latent_pipeline(models)
    ctx = text_encode(["a deploy-path test prompt"])
    uncond = text_encode([""])
    lat = latent_sample(pipe, params, jax.random.PRNGKey(0), ctx, uncond,
                        height=32, width=32, steps=2, guidance_scale=5.0)
    imgs = np.asarray(decode_latents(pipe, params["vq"], lat))
    assert imgs.shape == (1, 32, 32, 3)
    assert np.isfinite(imgs).all()


# --------------------------------------------------------------------------
# Guided stack: ADM UNet + CLIP + aesthetic head -> build_models -> sample
# --------------------------------------------------------------------------

def test_deploy_guided_stack(deploy_env, monkeypatch):
    tmp_path, flax_root = deploy_env
    ucfg = UNetConfig.tiny(64)
    unet_sd = _randomize_adm(TorchADMUNet(ucfg), seed=4).state_dict()
    monkeypatch.setitem(
        fc.ARTIFACTS, "unet", (_serve(tmp_path, "tiny-adm.pt", unet_sd),
                               "tiny-adm.pt"),
    )
    ccfg = tiny_clip_config(name="tiny")
    clip_sd = _randomize_adm(TorchCLIP(ccfg), seed=5).state_dict()
    monkeypatch.setattr(
        fc, "CLIP_JIT", {"tiny": _serve(tmp_path, "tiny-clip.pt", clip_sd)}
    )
    # simulacra linear probe (real head shape: Linear(512, 1))
    aes_sd = {"linear.weight": torch.randn(1, 512) * 0.05,
              "linear.bias": torch.zeros(1)}
    monkeypatch.setattr(fc, "AESTHETIC", {
        "ViT-B/32": (_serve(tmp_path, "tiny-aes.pth", aes_sd),
                     "tiny-aes.pth"),
    })

    fc.main(["--unet", "--clip", "tiny", "--aesthetic"])

    from clip_diffusion_tpu.models.convert import convert_clip, convert_unet

    monkeypatch.setitem(CLIP_PRESETS, "tiny", ccfg)
    cfg = tiny_config(chosen_clip_models=("tiny",), chosen_predictors=())
    models = zoo.build_models(
        cfg, image_size=512, param_dtype=jnp.float32,
        checkpoint_root=flax_root, unet_config=ucfg,
    )
    _assert_loaded(models.unet_params,
                   convert_unet({k: v.numpy() for k, v in unet_sd.items()}))
    _assert_loaded(models.clips["tiny"][1],
                   convert_clip({k: v.numpy() for k, v in clip_sd.items()}))

    # aesthetic head loads through the same gate against the REAL template
    from clip_diffusion_tpu.models.aesthetic import (
        convert_aesthetic,
        make_aesthetic_predictor,
    )

    head = make_aesthetic_predictor("ViT-B/32")
    hp = zoo.load_or_init(
        "aesthetic_ViT-B_32",
        lambda: head.init(jax.random.PRNGKey(0), jnp.ones((1, 512))),
        param_dtype=jnp.float32, root=flax_root,
    )
    _assert_loaded(
        hp, convert_aesthetic({k: v.numpy() for k, v in aes_sd.items()})
    )

    # ... and the loaded guided stack samples finite pixels end-to-end
    from clip_diffusion_tpu.diffusion.sampling import SamplerConfig
    from clip_diffusion_tpu.pipeline.guided import guided_sample

    pipe, params = zoo.build_pipeline(
        models, cfg, [("a deploy test", 1.0)],
        SamplerConfig(mode="ddim", steps=3),
    )
    final, _ = guided_sample(pipe, params, jax.random.PRNGKey(0),
                             batch_size=1)
    imgs = np.asarray(final)
    assert imgs.shape == (1, 64, 64, 3)
    assert np.isfinite(imgs).all()


# --------------------------------------------------------------------------
# Real-ESRGAN: basicsr params_ema ckpts -> esrgan_x4/x2 -> upscale
# --------------------------------------------------------------------------

def _rrdb_sd(rng, num_in_ch, num_feat, num_block, num_grow_ch):
    sd = {}

    def add(name, cin, cout):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(size=(cout, cin, 3, 3)).astype("f") * 0.05
        )
        sd[f"{name}.bias"] = torch.zeros(cout)

    add("conv_first", num_in_ch, num_feat)
    for b in range(num_block):
        for r in range(1, 4):
            cin = num_feat
            for k in range(1, 6):
                add(f"body.{b}.rdb{r}.conv{k}", cin,
                    num_grow_ch if k < 5 else num_feat)
                cin += num_grow_ch
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
        add(name, num_feat, num_feat)
    add("conv_last", num_feat, 3)
    return sd


def test_deploy_esrgan(deploy_env, monkeypatch):
    tmp_path, flax_root = deploy_env
    rng = np.random.default_rng(6)
    # tiny shapes matching zoo.build_esrgan(tiny=True); x2 pixel-unshuffles
    # (conv_first sees 3*2*2=12 channels)
    sd4 = _rrdb_sd(rng, 3, 16, 2, 8)
    sd2 = _rrdb_sd(rng, 12, 16, 2, 8)
    monkeypatch.setitem(fc.ARTIFACTS, "esrgan_x4", (
        _serve(tmp_path, "tiny-x4.pth", {"params_ema": sd4}), "tiny-x4.pth"))
    monkeypatch.setitem(fc.ARTIFACTS, "esrgan_x2", (
        _serve(tmp_path, "tiny-x2.pth", {"params": sd2}), "tiny-x2.pth"))

    fc.main(["--esrgan"])

    from clip_diffusion_tpu.models.esrgan import convert_rrdbnet, upscale

    for scale, sd in ((4, sd4), (2, sd2)):
        model, params = zoo.build_esrgan(scale=scale, tiny=True,
                                         checkpoint_root=flax_root)
        _assert_loaded(params,
                       convert_rrdbnet({k: v.numpy() for k, v in sd.items()}))
        out = np.asarray(upscale(model, params,
                                 np.full((1, 8, 8, 3), 0.5, np.float32)))
        assert out.shape == (1, 8 * scale, 8 * scale, 3)
        assert np.isfinite(out).all()


# --------------------------------------------------------------------------
# LPIPS: torchvision VGG16 + lin heads -> lpips_vgg -> distance
# --------------------------------------------------------------------------

def test_deploy_lpips(deploy_env, monkeypatch):
    tmp_path, flax_root = deploy_env
    rng = np.random.default_rng(7)
    vgg_sd, cin = {}, 3
    widths = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
    from clip_diffusion_tpu.models.lpips import _TORCHVISION_VGG16_CONV_IDX

    for idx, cout in zip(_TORCHVISION_VGG16_CONV_IDX, widths):
        vgg_sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(size=(cout, cin, 3, 3)).astype("f") * 0.02
        )
        vgg_sd[f"features.{idx}.bias"] = torch.zeros(cout)
        cin = cout
    lin_sd = {
        f"lin{i}.model.1.weight": torch.tensor(
            np.abs(rng.normal(size=(1, ch, 1, 1)).astype("f"))
        )
        for i, ch in enumerate((64, 128, 256, 512, 512))
    }
    monkeypatch.setitem(fc.ARTIFACTS, "vgg16",
                        (_serve(tmp_path, "vgg16.pth", vgg_sd), "vgg16.pth"))
    monkeypatch.setitem(fc.ARTIFACTS, "lpips_lin",
                        (_serve(tmp_path, "lin.pth", lin_sd), "lin.pth"))

    fc.main(["--lpips"])

    from clip_diffusion_tpu.models.lpips import convert_lpips_parts

    model, params = zoo.build_lpips(checkpoint_root=flax_root)
    _assert_loaded(params, convert_lpips_parts(
        {k: v.numpy() for k, v in vgg_sd.items()},
        {k: v.numpy() for k, v in lin_sd.items()},
    ))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), minval=-1)
    d_self = float(model.apply(params, x, x)[0])
    d_other = float(model.apply(params, x, -x)[0])
    assert abs(d_self) < 1e-6
    assert np.isfinite(d_other) and d_other > 0
