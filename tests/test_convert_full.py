"""FULL-MODEL converter round trips (VERDICT item 7).

tests/test_convert.py proves per-layer-family parity against torch.nn;
these tests exercise `convert_unet` / `convert_clip`'s COMPLETE key mapping:
tiny torch models emitting the exact reference state-dict naming (ADM
`input_blocks.N.M.*`, CLIP `visual.transformer.resblocks.N.*`,
`visual.layer1.0.*`) are converted and the WHOLE model's activations
compared.  Torch layers are real torch.nn modules (GroupNorm, Conv,
MultiheadAttention, BatchNorm, ...); only the wiring mirrors the
architectures (ADM guided-diffusion UNet, CLIP ViT + ModifiedResNet)."""

import math
from collections import OrderedDict

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from clip_diffusion_tpu.models.clip.model import CLIPModel, tiny_clip_config
from clip_diffusion_tpu.models.convert import (
    convert_clip,
    convert_unet,
    validate_against,
)
from clip_diffusion_tpu.models.unet import UNetConfig, UNetModel


def _gn(ch):
    return tnn.GroupNorm(min(32, ch), ch, eps=1e-5)


# --------------------------------------------------------------------------
# Torch ADM UNet oracle (reference state-dict naming)
# --------------------------------------------------------------------------

class TResBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, emb_dim, up=False, down=False):
        super().__init__()
        self.in_layers = tnn.Sequential(
            _gn(in_ch), tnn.SiLU(), tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        )
        self.emb_layers = tnn.Sequential(
            tnn.SiLU(), tnn.Linear(emb_dim, 2 * out_ch)
        )
        self.out_layers = tnn.Sequential(
            _gn(out_ch), tnn.SiLU(), tnn.Identity(),
            tnn.Conv2d(out_ch, out_ch, 3, padding=1),
        )
        if in_ch != out_ch:
            self.skip_connection = tnn.Conv2d(in_ch, out_ch, 1)
        else:
            self.skip_connection = None
        self.up, self.down = up, down

    def forward(self, x, emb):
        h = self.in_layers[1](self.in_layers[0](x))
        if self.down:
            h = F.avg_pool2d(h, 2)
            x = F.avg_pool2d(x, 2)
        elif self.up:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        h = self.in_layers[2](h)
        scale, shift = self.emb_layers(emb)[:, :, None, None].chunk(2, dim=1)
        h = self.out_layers[0](h) * (1 + scale) + shift
        h = self.out_layers[3](self.out_layers[1](h))
        skip = x if self.skip_connection is None else self.skip_connection(x)
        return skip + h


class TAttnBlock(tnn.Module):
    """ADM AttentionBlock, QKVAttentionLegacy per-head [q;k;v] order."""

    def __init__(self, ch, head_ch):
        super().__init__()
        self.norm = _gn(ch)
        self.qkv = tnn.Conv1d(ch, 3 * ch, 1)
        self.proj_out = tnn.Conv1d(ch, ch, 1)
        self.heads = ch // head_ch
        self.d = head_ch

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.qkv(self.norm(x).reshape(b, c, h * w))
        q, k, v = qkv.reshape(b * self.heads, 3 * self.d, h * w).split(
            self.d, dim=1
        )
        scale = 1 / math.sqrt(math.sqrt(self.d))
        wgt = torch.einsum("bct,bcs->bts", q * scale, k * scale)
        wgt = torch.softmax(wgt.float(), dim=-1).type(wgt.dtype)
        a = torch.einsum("bts,bcs->bct", wgt, v).reshape(b, c, h * w)
        return x + self.proj_out(a).reshape(b, c, h, w)


def _timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TorchADMUNet(tnn.Module):
    """Mirrors UNetModel's wiring with the ADM torch key layout."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        mc = cfg.model_channels
        emb_dim = mc * 4
        self.time_embed = tnn.Sequential(
            tnn.Linear(mc, emb_dim), tnn.SiLU(), tnn.Linear(emb_dim, emb_dim)
        )
        ch0 = int(cfg.channel_mult[0] * mc)
        self.input_blocks = tnn.ModuleList(
            [tnn.ModuleList([tnn.Conv2d(cfg.in_channels, ch0, 3, padding=1)])]
        )
        ch, ds = ch0, 1
        self._in_meta = ["stem"]
        for level, mult in enumerate(cfg.channel_mult):
            out_ch = int(mult * mc)
            for _ in range(cfg.num_res_blocks):
                mods = [TResBlock(ch, out_ch, emb_dim)]
                ch = out_ch
                if ds in cfg.attention_ds:
                    mods.append(TAttnBlock(ch, cfg.num_head_channels))
                self.input_blocks.append(tnn.ModuleList(mods))
                self._in_meta.append("block")
            if level != len(cfg.channel_mult) - 1:
                self.input_blocks.append(
                    tnn.ModuleList([TResBlock(ch, ch, emb_dim, down=True)])
                )
                self._in_meta.append("block")
                ds *= 2
        self.middle_block = tnn.ModuleList([
            TResBlock(ch, ch, emb_dim),
            TAttnBlock(ch, cfg.num_head_channels),
            TResBlock(ch, ch, emb_dim),
        ])
        # skip channel bookkeeping for output block in_channels
        skip_chs = [ch0]
        c2, d2 = ch0, 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                c2 = int(mult * mc)
                skip_chs.append(c2)
            if level != len(cfg.channel_mult) - 1:
                skip_chs.append(c2)
                d2 *= 2
        self.output_blocks = tnn.ModuleList()
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            out_ch = int(mult * mc)
            for i in range(cfg.num_res_blocks + 1):
                mods = [TResBlock(ch + skip_chs.pop(), out_ch, emb_dim)]
                ch = out_ch
                if d2 in cfg.attention_ds:
                    mods.append(TAttnBlock(ch, cfg.num_head_channels))
                if level and i == cfg.num_res_blocks:
                    mods.append(TResBlock(ch, ch, emb_dim, up=True))
                    d2 //= 2
                self.output_blocks.append(tnn.ModuleList(mods))
        self.out = tnn.Sequential(
            _gn(ch), tnn.SiLU(), tnn.Conv2d(ch, cfg.out_channels, 3, padding=1)
        )

    def forward(self, x, t):
        emb = self.time_embed(_timestep_embedding(t, self.cfg.model_channels))
        h = self.input_blocks[0][0](x)
        skips = [h]
        for mods in list(self.input_blocks)[1:]:
            for m in mods:
                h = m(h, emb) if isinstance(m, TResBlock) else m(h)
            skips.append(h)
        for m in self.middle_block:
            h = m(h, emb) if isinstance(m, TResBlock) else m(h)
        for mods in self.output_blocks:
            h = torch.cat([h, skips.pop()], dim=1)
            for m in mods:
                h = m(h, emb) if isinstance(m, TResBlock) else m(h)
        return self.out(h)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model


def test_unet_full_state_dict_round_trip():
    cfg = UNetConfig.tiny(32)
    oracle = _randomize(TorchADMUNet(cfg)).eval()
    sd = oracle.state_dict()
    # the exact reference key families are present
    assert "input_blocks.0.0.weight" in sd
    assert any(k.startswith("input_blocks.1.0.in_layers.0") for k in sd)
    assert any(".qkv.weight" in k for k in sd)
    assert any(k.startswith("output_blocks") and ".emb_layers.1." in k
               for k in sd)

    params = convert_unet(sd)
    model = UNetModel(cfg)
    template = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)), jnp.zeros((1,))
    )
    problems = validate_against(template, params)
    assert not problems, problems

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    t = np.asarray([3.0, 250.0], np.float32)
    with torch.no_grad():
        ref = oracle(
            torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(t)
        ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_unet_unknown_key_raises():
    with pytest.raises(KeyError):
        convert_unet({"input_blocks.1.0.bogus_layer.weight":
                      np.zeros((4, 4))})


# --------------------------------------------------------------------------
# Torch CLIP oracle (ViT + text towers, reference naming)
# --------------------------------------------------------------------------

class TQuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TResidualAttentionBlock(tnn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(width)
        self.attn = tnn.MultiheadAttention(width, heads)
        self.ln_2 = tnn.LayerNorm(width)
        self.mlp = tnn.Sequential(OrderedDict([
            ("c_fc", tnn.Linear(width, 4 * width)),
            ("gelu", TQuickGELU()),
            ("c_proj", tnn.Linear(4 * width, width)),
        ]))

    def forward(self, x, mask=None):
        y = self.ln_1(x)
        y = self.attn(y, y, y, need_weights=False, attn_mask=mask)[0]
        x = x + y
        return x + self.mlp(self.ln_2(x))


class TTransformer(tnn.Module):
    def __init__(self, width, layers, heads):
        super().__init__()
        self.resblocks = tnn.ModuleList(
            [TResidualAttentionBlock(width, heads) for _ in range(layers)]
        )

    def forward(self, x, mask=None):
        for b in self.resblocks:
            x = b(x, mask)
        return x


class TVisionTransformer(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        w, p = cfg.vision_width, cfg.vision_patch_size
        grid = cfg.image_resolution // p
        self.conv1 = tnn.Conv2d(3, w, p, stride=p, bias=False)
        self.class_embedding = tnn.Parameter(torch.zeros(w))
        self.positional_embedding = tnn.Parameter(
            torch.zeros(grid * grid + 1, w)
        )
        self.ln_pre = tnn.LayerNorm(w)
        self.transformer = TTransformer(w, cfg.vision_layers, cfg.vision_heads)
        self.ln_post = tnn.LayerNorm(w)
        self.proj = tnn.Parameter(torch.zeros(w, cfg.embed_dim))

    def forward(self, x):
        x = self.conv1(x)
        b, w, gh, gw = x.shape
        x = x.reshape(b, w, gh * gw).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).permute(1, 0, 2)  # LND for torch MHA
        x = self.transformer(x).permute(1, 0, 2)
        return self.ln_post(x[:, 0]) @ self.proj


class TorchCLIP(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.visual = TVisionTransformer(cfg)
        self.token_embedding = tnn.Embedding(cfg.vocab_size, cfg.text_width)
        self.positional_embedding = tnn.Parameter(
            torch.zeros(cfg.context_length, cfg.text_width)
        )
        self.transformer = TTransformer(
            cfg.text_width, cfg.text_layers, cfg.text_heads
        )
        self.ln_final = tnn.LayerNorm(cfg.text_width)
        self.text_projection = tnn.Parameter(
            torch.zeros(cfg.text_width, cfg.embed_dim)
        )
        self.logit_scale = tnn.Parameter(torch.zeros(()))

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        t = tokens.shape[1]
        mask = torch.full((t, t), float("-inf")).triu(1)
        x = self.transformer(x.permute(1, 0, 2), mask).permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return pooled @ self.text_projection


@pytest.fixture(scope="module")
def clip_pair():
    cfg = tiny_clip_config()
    oracle = _randomize(TorchCLIP(cfg), seed=1).eval()
    sd = oracle.state_dict()
    assert any(k.startswith("visual.transformer.resblocks.0.attn.in_proj")
               for k in sd)
    params = convert_clip(sd)
    model = CLIPModel(cfg)
    return cfg, oracle, model, params


def test_clip_full_structure(clip_pair):
    cfg, _, model, params = clip_pair
    toks = np.zeros((1, cfg.context_length), np.int32)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, cfg.image_resolution, cfg.image_resolution, 3)),
        jnp.asarray(toks),
    )
    problems = validate_against(template, params)
    assert not problems, problems


def test_clip_image_tower_round_trip(clip_pair):
    cfg, oracle, model, params = clip_pair
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (2, cfg.image_resolution, cfg.image_resolution,
                              3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle.encode_image(
            torch.tensor(img.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(
        model.apply(params, jnp.asarray(img), method=CLIPModel.encode_image)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_clip_text_tower_round_trip(clip_pair):
    cfg, oracle, model, params = clip_pair
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 400, (2, cfg.context_length))
    toks[0, 9] = 40000  # EOT pooling position = argmax token id
    toks[1, 3] = 40000
    with torch.no_grad():
        ref = oracle.encode_text(torch.tensor(toks, dtype=torch.long)).numpy()
    got = np.asarray(
        model.apply(
            params, jnp.asarray(toks, jnp.int32), method=CLIPModel.encode_text
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_clip_unknown_key_raises():
    with pytest.raises(KeyError):
        convert_clip({"visual.mystery.weight": np.zeros((4, 4))})


# --------------------------------------------------------------------------
# Torch ModifiedResNet oracle (RN50/RN101 family, reference naming)
# --------------------------------------------------------------------------

class TBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.avgpool = tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity()
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(OrderedDict([
                ("-1", tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity()),
                ("0", tnn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                ("1", tnn.BatchNorm2d(planes * 4)),
            ]))
        else:
            self.downsample = None

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(self.avgpool(out)))
        identity = x if self.downsample is None else self.downsample(x)
        return F.relu(out + identity)


class TModifiedResNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        w = cfg.vision_width
        self.conv1 = tnn.Conv2d(3, w // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(w // 2)
        self.conv2 = tnn.Conv2d(w // 2, w // 2, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(w // 2)
        self.conv3 = tnn.Conv2d(w // 2, w, 3, padding=1, bias=False)
        self.bn3 = tnn.BatchNorm2d(w)
        inplanes = w
        for li, blocks in enumerate(cfg.vision_layers):
            planes = w * (2**li)
            stride = 1 if li == 0 else 2
            layer = tnn.Sequential(*[
                TBottleneck(inplanes if bi == 0 else planes * 4, planes,
                            stride if bi == 0 else 1)
                for bi in range(blocks)
            ])
            setattr(self, f"layer{li + 1}", layer)
            inplanes = planes * 4
        embed_dim = w * 32
        self.attnpool = TAttnPool(
            cfg.image_resolution // 32, embed_dim, embed_dim // 64,
            cfg.embed_dim,
        )

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = F.avg_pool2d(x, 2)
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return self.attnpool(x)


class TAttnPool(tnn.Module):
    def __init__(self, spacial, embed_dim, heads, output_dim):
        super().__init__()
        self.positional_embedding = tnn.Parameter(
            torch.zeros(spacial**2 + 1, embed_dim)
        )
        self.k_proj = tnn.Linear(embed_dim, embed_dim)
        self.q_proj = tnn.Linear(embed_dim, embed_dim)
        self.v_proj = tnn.Linear(embed_dim, embed_dim)
        self.c_proj = tnn.Linear(embed_dim, output_dim)
        self.heads = heads
        self.d = embed_dim // heads

    def forward(self, x):
        b, c, h, w = x.shape
        x = x.reshape(b, c, h * w).permute(0, 2, 1)
        x = torch.cat([x.mean(dim=1, keepdim=True), x], dim=1)
        x = x + self.positional_embedding
        q = self.q_proj(x[:, :1]).reshape(b, 1, self.heads, self.d)
        k = self.k_proj(x).reshape(b, -1, self.heads, self.d)
        v = self.v_proj(x).reshape(b, -1, self.heads, self.d)
        wgt = torch.einsum("bthd,bshd->bhts", q, k) / math.sqrt(self.d)
        a = torch.softmax(wgt, dim=-1)
        out = torch.einsum("bhts,bshd->bthd", a, v).reshape(b, 1, -1)
        return self.c_proj(out)[:, 0]


def test_clip_resnet_tower_round_trip():
    cfg = tiny_clip_config(resnet=True)
    oracle = TorchCLIP.__new__(TorchCLIP)  # only the visual tower differs
    tnn.Module.__init__(oracle)
    oracle.visual = TModifiedResNet(cfg)
    oracle.token_embedding = tnn.Embedding(cfg.vocab_size, cfg.text_width)
    oracle.positional_embedding = tnn.Parameter(
        torch.zeros(cfg.context_length, cfg.text_width)
    )
    oracle.transformer = TTransformer(
        cfg.text_width, cfg.text_layers, cfg.text_heads
    )
    oracle.ln_final = tnn.LayerNorm(cfg.text_width)
    oracle.text_projection = tnn.Parameter(
        torch.zeros(cfg.text_width, cfg.embed_dim)
    )
    oracle.logit_scale = tnn.Parameter(torch.zeros(()))
    _randomize(oracle, seed=3)
    # BN running stats must be non-trivial to catch mean/var mapping bugs
    g = torch.Generator().manual_seed(4)
    with torch.no_grad():
        for name, buf in oracle.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(1.0 + torch.rand(buf.shape, generator=g))
    oracle.eval()

    sd = oracle.state_dict()
    assert any(k.startswith("visual.layer2.0.downsample.0") for k in sd)
    variables = convert_clip(sd)
    assert "batch_stats" in variables

    model = CLIPModel(cfg)
    rng = np.random.default_rng(5)
    img = rng.uniform(-1, 1, (2, cfg.image_resolution, cfg.image_resolution,
                              3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle.visual(torch.tensor(img.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        model.apply(
            variables, jnp.asarray(img), method=CLIPModel.encode_image
        )
    )
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)
