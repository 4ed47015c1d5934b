"""Activation-level parity of converted weights against torch.nn layers —
the weight-porting fidelity harness of SURVEY.md §7 ("hard parts").  torch
(CPU) is used as the conversion oracle only; no reference code involved."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402

from clip_diffusion_tpu.models.convert import (  # noqa: E402
    conv1d_as_dense,
    conv_kernel,
    convert_clip,
    convert_unet,
    linear_kernel,
    validate_against,
)


def test_conv2d_parity():
    t = torch.nn.Conv2d(3, 8, 3, padding=1)
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        ref = t(x).numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    fl = nn.Conv(8, (3, 3), padding=1)
    params = {
        "params": {
            "kernel": conv_kernel(t.weight),
            "bias": t.bias.detach().numpy(),
        }
    }
    got = fl.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_strided_conv_parity():
    """Stride-2 pad-1 conv — the ADM downsample op."""
    t = torch.nn.Conv2d(4, 8, 3, stride=2, padding=1)
    x = torch.randn(1, 4, 16, 16)
    with torch.no_grad():
        ref = t(x).numpy().transpose(0, 2, 3, 1)
    fl = nn.Conv(8, (3, 3), strides=(2, 2), padding=1)
    params = {"params": {"kernel": conv_kernel(t.weight),
                         "bias": t.bias.detach().numpy()}}
    got = fl.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_groupnorm_parity():
    from clip_diffusion_tpu.models.unet import GroupNorm32

    t = torch.nn.GroupNorm(32, 64)
    with torch.no_grad():
        t.weight.uniform_(0.5, 1.5)
        t.bias.uniform_(-0.5, 0.5)
    x = torch.randn(2, 64, 8, 8)
    with torch.no_grad():
        ref = t(x).numpy().transpose(0, 2, 3, 1)
    gn = GroupNorm32()
    params = {
        "params": {
            "GroupNorm_0": {
                "scale": t.weight.detach().numpy(),
                "bias": t.bias.detach().numpy(),
            }
        }
    }
    got = gn.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_multihead_attention_parity():
    """torch.nn.MultiheadAttention vs our packed-in_proj flax module."""
    from clip_diffusion_tpu.models.clip.model import MultiheadAttention

    width, heads = 64, 4
    t = torch.nn.MultiheadAttention(width, heads, batch_first=True)
    x = torch.randn(2, 10, width)
    with torch.no_grad():
        ref, _ = t(x, x, x, need_weights=False)
        ref = ref.numpy()

    fl = MultiheadAttention(width, heads)
    params = {
        "params": {
            "in_proj": {
                "kernel": linear_kernel(t.in_proj_weight),
                "bias": t.in_proj_bias.detach().numpy(),
            },
            "out_proj": {
                "kernel": linear_kernel(t.out_proj.weight),
                "bias": t.out_proj.bias.detach().numpy(),
            },
        }
    }
    got = fl.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_causal_masked_attention_parity():
    from clip_diffusion_tpu.models.clip.model import MultiheadAttention

    width, heads, t_len = 32, 2, 7
    t = torch.nn.MultiheadAttention(width, heads, batch_first=True)
    x = torch.randn(1, t_len, width)
    tmask = torch.triu(torch.full((t_len, t_len), float("-inf")), diagonal=1)
    with torch.no_grad():
        ref, _ = t(x, x, x, attn_mask=tmask, need_weights=False)
        ref = ref.numpy()
    fl = MultiheadAttention(width, heads)
    params = {
        "params": {
            "in_proj": {"kernel": linear_kernel(t.in_proj_weight),
                        "bias": t.in_proj_bias.detach().numpy()},
            "out_proj": {"kernel": linear_kernel(t.out_proj.weight),
                         "bias": t.out_proj.bias.detach().numpy()},
        }
    }
    jmask = jnp.triu(jnp.full((t_len, t_len), -jnp.inf, jnp.float32), k=1)
    got = fl.apply(params, jnp.asarray(x.numpy()), jmask)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_adm_qkv_attention_parity():
    """ADM attention: qkv conv1d with per-head-block layout + legacy scale.
    Build the torch computation inline (QKVAttentionLegacy math) and compare
    our AttentionBlock."""
    from clip_diffusion_tpu.models.unet import AttentionBlock

    c, heads, hw = 32, 2, 16
    d = c // heads
    torch.manual_seed(0)
    norm = torch.nn.GroupNorm(32 if c >= 32 else c, c)
    qkv_conv = torch.nn.Conv1d(c, 3 * c, 1)
    proj = torch.nn.Conv1d(c, c, 1)

    x = torch.randn(1, c, hw)  # (B, C, T)
    with torch.no_grad():
        qkv = qkv_conv(norm(x.unsqueeze(-1)).squeeze(-1))  # (B, 3C, T)
        q, k, v = qkv.reshape(heads, 3 * d, hw).split(d, dim=1)
        scale = 1 / np.sqrt(np.sqrt(d))
        w = torch.einsum("hct,hcs->hts", q * scale, k * scale)
        w = torch.softmax(w, dim=-1)
        a = torch.einsum("hts,hcs->hct", w, v).reshape(1, c, hw)
        ref = (x + proj(a)).numpy()  # (B, C, T)

    fl = AttentionBlock(num_head_channels=d, dtype=jnp.float32)
    params = {
        "params": {
            "norm": {"GroupNorm_0": {"scale": norm.weight.detach().numpy(),
                                     "bias": norm.bias.detach().numpy()}},
            "qkv": {"kernel": conv1d_as_dense(qkv_conv.weight),
                    "bias": qkv_conv.bias.detach().numpy()},
            "proj_out": {"kernel": conv1d_as_dense(proj.weight),
                         "bias": proj.bias.detach().numpy()},
        }
    }
    # flax input is NHWC: reshape (1, c, hw) -> (1, 4, 4, c)
    x_nhwc = x.numpy().transpose(0, 2, 1).reshape(1, 4, 4, c)
    got = fl.apply(params, jnp.asarray(x_nhwc))
    ref_nhwc = ref.transpose(0, 2, 1).reshape(1, 4, 4, c)
    np.testing.assert_allclose(np.asarray(got), ref_nhwc, atol=1e-4)


def test_batchnorm_parity():
    t = torch.nn.BatchNorm2d(8)
    with torch.no_grad():
        t.weight.uniform_(0.5, 1.5)
        t.bias.uniform_(-0.5, 0.5)
        t.running_mean.uniform_(-1, 1)
        t.running_var.uniform_(0.5, 2)
    t.eval()
    x = torch.randn(2, 8, 4, 4)
    with torch.no_grad():
        ref = t(x).numpy().transpose(0, 2, 3, 1)
    bn = nn.BatchNorm(use_running_average=True)
    params = {
        "params": {"scale": t.weight.detach().numpy(),
                   "bias": t.bias.detach().numpy()},
        "batch_stats": {"mean": t.running_mean.numpy(),
                        "var": t.running_var.numpy()},
    }
    got = bn.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_unet_statedict_structure_roundtrip():
    """Build a synthetic torch-style state dict from a tiny flax UNet's own
    shapes (inverse mapping), convert it, and check structure + shapes match
    the model template exactly."""
    from clip_diffusion_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.tiny(16)
    model = UNetModel(cfg)
    template = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 3)), jnp.zeros((1,))
    )

    sd = {}

    def emit(path, leaf_tree):
        flat = jax.tree_util.tree_flatten_with_path(leaf_tree)[0]
        for kp, v in flat:
            keys = [str(k.key) for k in kp]
            _emit_torch_key(sd, path + keys, np.asarray(v))

    emit([], template["params"])
    converted = convert_unet(sd)
    problems = validate_against(template, converted)
    assert not problems, problems[:10]


def _emit_torch_key(sd, keys, arr):
    """flax path -> synthetic torch key with torch-layout array."""
    name = "/".join(keys)
    # normalize flax path back to torch dotted path
    torch_key = (
        name.replace("params/", "")
        .replace("GroupNorm_0/", "")
        .replace("kernel", "weight")
        .replace("scale", "weight")
    )
    torch_key = torch_key.replace("/", ".")
    # block names: input_blocks_3_0 -> input_blocks.3.0 etc.
    torch_key = torch_key.replace("input_blocks_", "input_blocks.")
    torch_key = torch_key.replace("output_blocks_", "output_blocks.")
    torch_key = torch_key.replace("middle_block_", "middle_block.")
    torch_key = torch_key.replace("time_embed_", "time_embed.")
    torch_key = torch_key.replace("out_0", "out.0").replace("out_2", "out.2")
    torch_key = torch_key.replace("in_layers_", "in_layers.")
    torch_key = torch_key.replace("out_layers_", "out_layers.")
    torch_key = torch_key.replace("emb_layers_", "emb_layers.")
    import re as _re

    torch_key = _re.sub(r"blocks\.(\d+)_(\d+)", r"blocks.\1.\2", torch_key)

    if torch_key.endswith("weight") and arr.ndim == 4:  # conv
        arr = arr.transpose(3, 2, 0, 1)
    elif torch_key.endswith("weight") and arr.ndim == 2:
        parent = keys[-2]
        if parent in ("qkv", "proj_out"):
            arr = arr.T[:, :, None]  # dense -> conv1d
        else:
            arr = arr.T
    sd[torch_key] = arr


def test_clip_statedict_smoke():
    """Converter handles a ViT-shaped synthetic state dict without error and
    validates against the tiny model template."""
    from clip_diffusion_tpu.models.clip.model import CLIPModel, tiny_clip_config
    from clip_diffusion_tpu.models.clip.tokenizer import tokenize

    cfg = tiny_clip_config()
    model = CLIPModel(cfg)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, cfg.image_resolution, cfg.image_resolution, 3)),
        jnp.asarray(tokenize(["x"])),
    )

    rng = np.random.default_rng(0)
    w = cfg.vision_width
    tw = cfg.text_width
    grid = cfg.image_resolution // cfg.vision_patch_size
    sd = {
        "visual.conv1.weight": rng.normal(size=(w, 3, 16, 16)).astype("f"),
        "visual.class_embedding": rng.normal(size=(w,)).astype("f"),
        "visual.positional_embedding": rng.normal(
            size=(grid * grid + 1, w)
        ).astype("f"),
        "visual.ln_pre.weight": np.ones(w, "f"),
        "visual.ln_pre.bias": np.zeros(w, "f"),
        "visual.ln_post.weight": np.ones(w, "f"),
        "visual.ln_post.bias": np.zeros(w, "f"),
        "visual.proj": rng.normal(size=(w, cfg.embed_dim)).astype("f"),
        "token_embedding.weight": rng.normal(
            size=(cfg.vocab_size, tw)
        ).astype("f"),
        "positional_embedding": rng.normal(
            size=(cfg.context_length, tw)
        ).astype("f"),
        "ln_final.weight": np.ones(tw, "f"),
        "ln_final.bias": np.zeros(tw, "f"),
        "text_projection": rng.normal(size=(tw, cfg.embed_dim)).astype("f"),
        "logit_scale": np.zeros((), "f"),
    }
    for pfx, layers, width in [
        ("visual.transformer", cfg.vision_layers, w),
        ("transformer", cfg.text_layers, tw),
    ]:
        for i in range(layers):
            b = f"{pfx}.resblocks.{i}"
            sd[f"{b}.ln_1.weight"] = np.ones(width, "f")
            sd[f"{b}.ln_1.bias"] = np.zeros(width, "f")
            sd[f"{b}.ln_2.weight"] = np.ones(width, "f")
            sd[f"{b}.ln_2.bias"] = np.zeros(width, "f")
            sd[f"{b}.attn.in_proj_weight"] = rng.normal(
                size=(3 * width, width)
            ).astype("f")
            sd[f"{b}.attn.in_proj_bias"] = np.zeros(3 * width, "f")
            sd[f"{b}.attn.out_proj.weight"] = rng.normal(
                size=(width, width)
            ).astype("f")
            sd[f"{b}.attn.out_proj.bias"] = np.zeros(width, "f")
            sd[f"{b}.mlp.c_fc.weight"] = rng.normal(
                size=(4 * width, width)
            ).astype("f")
            sd[f"{b}.mlp.c_fc.bias"] = np.zeros(4 * width, "f")
            sd[f"{b}.mlp.c_proj.weight"] = rng.normal(
                size=(width, 4 * width)
            ).astype("f")
            sd[f"{b}.mlp.c_proj.bias"] = np.zeros(width, "f")

    converted = convert_clip(sd)
    problems = validate_against(template, converted)
    assert not problems, problems[:10]
