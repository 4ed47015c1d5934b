"""LDM-stack converter round trips (VERDICT r2 item 1a).

Like tests/test_convert_full.py for ADM/CLIP: tiny torch models emitting the
EXACT reference state-dict naming of the three LatentDiffusion submodels —
the CompVis openaimodel UNet (`model.diffusion_model.input_blocks.N.M.*`,
SpatialTransformer `transformer_blocks.D.attn{1,2}.to_q` / `ff.net.0.proj`),
the taming VQ autoencoder (`first_stage_model.encoder.down.L.block.I.*`,
`quantize.embedding`), and the x-transformers BERTEmbedder
(`cond_stage_model.transformer.attn_layers.layers.{2i}.1.to_q`) — are
converted by models/ldm/convert.py and the WHOLE submodel's activations
compared.  Plus the LitEma shadow-weight preference of split_ldm_state_dict.
"""

import math
from collections import OrderedDict

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from clip_diffusion_tpu.models.convert import validate_against
from clip_diffusion_tpu.models.ldm.bert import BERTConfig, BERTEmbedder
from clip_diffusion_tpu.models.ldm.autoencoder import VQConfig, VQModel
from clip_diffusion_tpu.models.ldm.convert import (
    convert_bert,
    convert_ldm_checkpoint,
    convert_ldm_unet,
    convert_vq,
    split_ldm_state_dict,
)
from clip_diffusion_tpu.models.ldm.unet import LDMUNet, LDMUNetConfig


def _gn(ch, eps=1e-5):
    return tnn.GroupNorm(min(32, ch), ch, eps=eps)


def _randomize(model, seed=0, scale=0.05):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    return model


def _timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


# --------------------------------------------------------------------------
# Torch LDM UNet oracle (CompVis openaimodel + SpatialTransformer naming)
# --------------------------------------------------------------------------

class TLDMResBlock(tnn.Module):
    """openaimodel ResBlock, use_scale_shift_norm=False (LDM config)."""

    def __init__(self, in_ch, out_ch, emb_dim):
        super().__init__()
        self.in_layers = tnn.Sequential(
            _gn(in_ch), tnn.SiLU(), tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        )
        self.emb_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(emb_dim, out_ch))
        self.out_layers = tnn.Sequential(
            _gn(out_ch), tnn.SiLU(), tnn.Identity(),
            tnn.Conv2d(out_ch, out_ch, 3, padding=1),
        )
        self.skip_connection = (
            tnn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, emb):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[:, :, None, None]
        h = self.out_layers(h)
        return (x if self.skip_connection is None else self.skip_connection(x)) + h


class TCrossAttention(tnn.Module):
    def __init__(self, query_dim, context_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.to_q = tnn.Linear(query_dim, inner, bias=False)
        self.to_k = tnn.Linear(context_dim, inner, bias=False)
        self.to_v = tnn.Linear(context_dim, inner, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, query_dim), tnn.Dropout(0.0))
        self.heads, self.d = heads, dim_head

    def forward(self, x, context=None):
        context = x if context is None else context
        b, t, _ = x.shape
        s = context.shape[1]
        q = self.to_q(x).reshape(b, t, self.heads, self.d)
        k = self.to_k(context).reshape(b, s, self.heads, self.d)
        v = self.to_v(context).reshape(b, s, self.heads, self.d)
        logits = torch.einsum("bthd,bshd->bhts", q, k) / math.sqrt(self.d)
        a = torch.softmax(logits, dim=-1)
        out = torch.einsum("bhts,bshd->bthd", a, v).reshape(b, t, -1)
        return self.to_out(out)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class TBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, context_dim, heads, dim_head):
        super().__init__()
        self.attn1 = TCrossAttention(dim, dim, heads, dim_head)
        self.ff = tnn.Module()
        self.ff.net = tnn.Sequential(
            TGEGLU(dim, dim * 4), tnn.Dropout(0.0), tnn.Linear(dim * 4, dim)
        )
        self.attn2 = TCrossAttention(dim, context_dim, heads, dim_head)
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.norm3 = tnn.LayerNorm(dim)

    def forward(self, x, context):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        return self.ff.net(self.norm3(x)) + x


class TSpatialTransformer(tnn.Module):
    def __init__(self, ch, heads, depth, context_dim):
        super().__init__()
        self.norm = _gn(ch, eps=1e-6)  # CompVis Normalize
        self.proj_in = tnn.Conv2d(ch, ch, 1)
        self.transformer_blocks = tnn.ModuleList([
            TBasicTransformerBlock(ch, context_dim, heads, ch // heads)
            for _ in range(depth)
        ])
        self.proj_out = tnn.Conv2d(ch, ch, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        x_in = x
        x = self.proj_in(self.norm(x))
        x = x.reshape(b, c, h * w).permute(0, 2, 1)
        for blk in self.transformer_blocks:
            x = blk(x, context)
        x = x.permute(0, 2, 1).reshape(b, c, h, w)
        return self.proj_out(x) + x_in


class TDownsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.op = tnn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x, *a):
        return self.op(x)


class TUpsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x, *a):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TorchLDMUNet(tnn.Module):
    """Mirrors LDMUNet's wiring with the CompVis torch key layout."""

    def __init__(self, cfg: LDMUNetConfig):
        super().__init__()
        self.cfg = cfg
        mc = cfg.model_channels
        emb_dim = mc * 4
        self.time_embed = tnn.Sequential(
            tnn.Linear(mc, emb_dim), tnn.SiLU(), tnn.Linear(emb_dim, emb_dim)
        )
        self.input_blocks = tnn.ModuleList([
            tnn.ModuleList([tnn.Conv2d(cfg.in_channels, mc, 3, padding=1)])
        ])
        ch, ds = mc, 1
        for level, mult in enumerate(cfg.channel_mult):
            out_ch = mult * mc
            for _ in range(cfg.num_res_blocks):
                mods = [TLDMResBlock(ch, out_ch, emb_dim)]
                ch = out_ch
                if ds in cfg.attention_ds:
                    mods.append(TSpatialTransformer(
                        ch, cfg.num_heads, cfg.transformer_depth,
                        cfg.context_dim,
                    ))
                self.input_blocks.append(tnn.ModuleList(mods))
            if level != len(cfg.channel_mult) - 1:
                self.input_blocks.append(tnn.ModuleList([TDownsample(ch)]))
                ds *= 2
        self.middle_block = tnn.ModuleList([
            TLDMResBlock(ch, ch, emb_dim),
            TSpatialTransformer(ch, cfg.num_heads, cfg.transformer_depth,
                                cfg.context_dim),
            TLDMResBlock(ch, ch, emb_dim),
        ])
        skip_chs = [mc]
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                skip_chs.append(mult * mc)
            if level != len(cfg.channel_mult) - 1:
                skip_chs.append(mult * mc)
        self.output_blocks = tnn.ModuleList()
        d2 = ds
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            out_ch = mult * mc
            for i in range(cfg.num_res_blocks + 1):
                mods = [TLDMResBlock(ch + skip_chs.pop(), out_ch, emb_dim)]
                ch = out_ch
                if d2 in cfg.attention_ds:
                    mods.append(TSpatialTransformer(
                        ch, cfg.num_heads, cfg.transformer_depth,
                        cfg.context_dim,
                    ))
                if level and i == cfg.num_res_blocks:
                    mods.append(TUpsample(ch))
                    d2 //= 2
                self.output_blocks.append(tnn.ModuleList(mods))
        self.out = tnn.Sequential(
            _gn(ch), tnn.SiLU(), tnn.Conv2d(ch, cfg.out_channels, 3, padding=1)
        )

    def forward(self, x, t, context):
        emb = self.time_embed(_timestep_embedding(t, self.cfg.model_channels))

        def run(mods, h):
            for m in mods:
                if isinstance(m, TLDMResBlock):
                    h = m(h, emb)
                elif isinstance(m, TSpatialTransformer):
                    h = m(h, context)
                else:
                    h = m(h)
            return h

        h = self.input_blocks[0][0](x)
        skips = [h]
        for mods in list(self.input_blocks)[1:]:
            h = run(mods, h)
            skips.append(h)
        h = run(self.middle_block, h)
        for mods in self.output_blocks:
            h = torch.cat([h, skips.pop()], dim=1)
            h = run(mods, h)
        return self.out(h)


@pytest.fixture(scope="module")
def ldm_unet_pair():
    cfg = LDMUNetConfig.tiny()
    oracle = _randomize(TorchLDMUNet(cfg)).eval()
    sd = oracle.state_dict()
    # the exact reference key families are present
    assert "input_blocks.0.0.weight" in sd
    assert any(".transformer_blocks.0.attn1.to_q.weight" in k for k in sd)
    assert any(".transformer_blocks.0.ff.net.0.proj.weight" in k for k in sd)
    assert any(".transformer_blocks.0.attn2.to_out.0.bias" in k for k in sd)
    assert any(k.endswith(".op.weight") for k in sd)
    params = convert_ldm_unet(sd)
    return cfg, oracle, LDMUNet(cfg), params


def test_ldm_unet_structure(ldm_unet_pair):
    cfg, _, model, params = ldm_unet_pair
    template = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8, 8, cfg.in_channels)),
        jnp.zeros((1,)), jnp.ones((1, 3, cfg.context_dim)),
    )
    problems = validate_against(template, params)
    assert not problems, problems


def test_ldm_unet_round_trip(ldm_unet_pair):
    cfg, oracle, model, params = ldm_unet_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, cfg.in_channels)).astype(np.float32)
    t = np.asarray([3.0, 700.0], np.float32)
    ctx = rng.standard_normal((2, 5, cfg.context_dim)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(
            torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(t),
            torch.tensor(ctx),
        ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t),
                                 jnp.asarray(ctx)))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def test_ldm_unet_unknown_key_raises():
    with pytest.raises(KeyError):
        convert_ldm_unet({"input_blocks.1.1.bogus.weight": np.zeros((4, 4))})


# --------------------------------------------------------------------------
# Torch VQ autoencoder oracle (taming naming)
# --------------------------------------------------------------------------

class TAEResBlock(tnn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm1 = _gn(in_ch, eps=1e-6)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = _gn(out_ch, eps=1e-6)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.nin_shortcut = (
            tnn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return (x if self.nin_shortcut is None else self.nin_shortcut(x)) + h


class TAEAttn(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = _gn(ch, eps=1e-6)
        self.q = tnn.Conv2d(ch, ch, 1)
        self.k = tnn.Conv2d(ch, ch, 1)
        self.v = tnn.Conv2d(ch, ch, 1)
        self.proj_out = tnn.Conv2d(ch, ch, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.norm(x)
        q = self.q(y).reshape(b, c, h * w).permute(0, 2, 1)
        k = self.k(y).reshape(b, c, h * w)
        v = self.v(y).reshape(b, c, h * w)
        a = torch.softmax(torch.bmm(q, k) / math.sqrt(c), dim=-1)
        out = torch.bmm(v, a.permute(0, 2, 1)).reshape(b, c, h, w)
        return x + self.proj_out(out)


class TEncoder(tnn.Module):
    def __init__(self, cfg: VQConfig):
        super().__init__()
        c = cfg
        self.conv_in = tnn.Conv2d(3, c.ch, 3, padding=1)
        self.down = tnn.ModuleList()
        ch = c.ch
        res = c.resolution
        for level, mult in enumerate(c.ch_mult):
            down = tnn.Module()
            down.block = tnn.ModuleList()
            down.attn = tnn.ModuleList()
            for _ in range(c.num_res_blocks):
                down.block.append(TAEResBlock(ch, c.ch * mult))
                ch = c.ch * mult
                if res in c.attn_resolutions:
                    down.attn.append(TAEAttn(ch))
            if level != len(c.ch_mult) - 1:
                down.downsample = tnn.Module()
                down.downsample.conv = tnn.Conv2d(ch, ch, 3, stride=2)
                res //= 2
            self.down.append(down)
        self.mid = tnn.Module()
        self.mid.block_1 = TAEResBlock(ch, ch)
        self.mid.attn_1 = TAEAttn(ch)
        self.mid.block_2 = TAEResBlock(ch, ch)
        self.norm_out = _gn(ch, eps=1e-6)
        self.conv_out = tnn.Conv2d(ch, c.z_channels, 3, padding=1)
        self.cfg = cfg

    def forward(self, x):
        c = self.cfg
        h = self.conv_in(x)
        for level, down in enumerate(self.down):
            for i, blk in enumerate(down.block):
                h = blk(h)
                if len(down.attn) > i:
                    h = down.attn[i](h)
            if hasattr(down, "downsample"):
                h = down.downsample.conv(F.pad(h, (0, 1, 0, 1)))
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        return self.conv_out(F.silu(self.norm_out(h)))


class TDecoder(tnn.Module):
    def __init__(self, cfg: VQConfig):
        super().__init__()
        c = cfg
        block_in = c.ch * c.ch_mult[-1]
        self.conv_in = tnn.Conv2d(c.z_channels, block_in, 3, padding=1)
        self.mid = tnn.Module()
        self.mid.block_1 = TAEResBlock(block_in, block_in)
        self.mid.attn_1 = TAEAttn(block_in)
        self.mid.block_2 = TAEResBlock(block_in, block_in)
        self.up = tnn.ModuleList([tnn.Module() for _ in c.ch_mult])
        ch = block_in
        res = c.resolution // (2 ** (len(c.ch_mult) - 1))
        for level in reversed(range(len(c.ch_mult))):
            up = self.up[level]
            up.block = tnn.ModuleList()
            up.attn = tnn.ModuleList()
            for _ in range(c.num_res_blocks + 1):
                up.block.append(TAEResBlock(ch, c.ch * c.ch_mult[level]))
                ch = c.ch * c.ch_mult[level]
                if res in c.attn_resolutions:
                    up.attn.append(TAEAttn(ch))
            if level != 0:
                up.upsample = tnn.Module()
                up.upsample.conv = tnn.Conv2d(ch, ch, 3, padding=1)
                res *= 2
        self.norm_out = _gn(ch, eps=1e-6)
        self.conv_out = tnn.Conv2d(ch, c.out_ch, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        for level in reversed(range(len(self.up))):
            up = self.up[level]
            for i, blk in enumerate(up.block):
                h = blk(h)
                if len(up.attn) > i:
                    h = up.attn[i](h)
            if hasattr(up, "upsample"):
                h = up.upsample.conv(
                    F.interpolate(h, scale_factor=2, mode="nearest")
                )
        return self.conv_out(F.silu(self.norm_out(h)))


class TorchVQ(tnn.Module):
    def __init__(self, cfg: VQConfig):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TDecoder(cfg)
        self.quantize = tnn.Module()
        self.quantize.embedding = tnn.Embedding(cfg.n_embed, cfg.embed_dim)
        self.quant_conv = tnn.Conv2d(cfg.z_channels, cfg.embed_dim, 1)
        self.post_quant_conv = tnn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
        # training-only tail that conversion must skip
        self.loss = tnn.Module()
        self.loss.dummy = tnn.Linear(2, 2)

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        flat = z.permute(0, 2, 3, 1).reshape(-1, z.shape[1])
        e = self.quantize.embedding.weight
        d = (flat**2).sum(1, keepdim=True) - 2 * flat @ e.T + (e**2).sum(1)[None]
        zq = e[d.argmin(1)].reshape(
            z.shape[0], z.shape[2], z.shape[3], z.shape[1]
        ).permute(0, 3, 1, 2)
        return self.decoder(self.post_quant_conv(zq))


VQ_TEST_CFG = VQConfig(
    z_channels=4, embed_dim=4, n_embed=64, ch=16, ch_mult=(1, 2),
    num_res_blocks=1, attn_resolutions=(16,), resolution=32,
)


@pytest.fixture(scope="module")
def vq_pair():
    oracle = _randomize(TorchVQ(VQ_TEST_CFG), seed=7).eval()
    sd = oracle.state_dict()
    assert any(k.startswith("encoder.down.0.block.0.norm1") for k in sd)
    assert any(k.startswith("decoder.up.1.upsample.conv") for k in sd)
    assert any(k.startswith("encoder.down.1.attn.0.q") for k in sd)
    assert "quantize.embedding.weight" in sd
    params = convert_vq(sd)
    return oracle, VQModel(VQ_TEST_CFG), params


def test_vq_structure(vq_pair):
    oracle, model, params = vq_pair
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, VQ_TEST_CFG.resolution, VQ_TEST_CFG.resolution, 3)),
    )
    problems = validate_against(template, params)
    assert not problems, problems


def test_vq_encode_round_trip(vq_pair):
    oracle, model, params = vq_pair
    rng = np.random.default_rng(8)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle.encode(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x),
                                 method=VQModel.encode))
    np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 1), atol=3e-4,
                               rtol=1e-3)


def test_vq_decode_round_trip(vq_pair):
    oracle, model, params = vq_pair
    rng = np.random.default_rng(9)
    z = rng.standard_normal((2, 4, 4, 4)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = oracle.decode(torch.tensor(z.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(z),
                                 method=VQModel.decode))
    np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 1), atol=3e-4,
                               rtol=1e-3)


def test_vq_unknown_key_raises():
    with pytest.raises(KeyError):
        convert_vq({"encoder.bogus.weight": np.zeros((4, 4))})


# --------------------------------------------------------------------------
# Torch BERTEmbedder oracle (x-transformers naming)
# --------------------------------------------------------------------------

class TXAttention(tnn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(dim, inner, bias=False)
        self.to_v = tnn.Linear(dim, inner, bias=False)
        self.to_out = tnn.Linear(inner, dim)
        self.heads, self.d = heads, dim_head

    def forward(self, x):
        b, t, _ = x.shape
        q = self.to_q(x).reshape(b, t, self.heads, self.d)
        k = self.to_k(x).reshape(b, t, self.heads, self.d)
        v = self.to_v(x).reshape(b, t, self.heads, self.d)
        logits = torch.einsum("bthd,bshd->bhts", q, k) / math.sqrt(self.d)
        a = torch.softmax(logits, dim=-1)
        return self.to_out(
            torch.einsum("bhts,bshd->bthd", a, v).reshape(b, t, -1)
        )


class TXFeedForward(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Sequential(tnn.Linear(dim, dim * 4), tnn.GELU()),
            tnn.Dropout(0.0),
            tnn.Linear(dim * 4, dim),
        )

    def forward(self, x):
        return self.net(x)


class TorchBERT(tnn.Module):
    """x-transformers TransformerWrapper(Encoder(...)) key layout."""

    def __init__(self, cfg: BERTConfig):
        super().__init__()
        self.cfg = cfg
        self.token_emb = tnn.Embedding(cfg.vocab_size, cfg.n_embed)
        self.pos_emb = tnn.Module()
        self.pos_emb.emb = tnn.Embedding(cfg.max_seq_len, cfg.n_embed)
        self.attn_layers = tnn.Module()
        self.attn_layers.layers = tnn.ModuleList()
        for _ in range(cfg.n_layer):
            self.attn_layers.layers.append(tnn.ModuleList([
                tnn.LayerNorm(cfg.n_embed),
                TXAttention(cfg.n_embed, cfg.n_heads, cfg.dim_head),
            ]))
            self.attn_layers.layers.append(tnn.ModuleList([
                tnn.LayerNorm(cfg.n_embed),
                TXFeedForward(cfg.n_embed),
            ]))
        self.norm = tnn.LayerNorm(cfg.n_embed)
        self.to_logits = tnn.Linear(cfg.n_embed, cfg.vocab_size)  # unused

    def forward(self, tokens):
        t = tokens.shape[1]
        x = self.token_emb(tokens) + self.pos_emb.emb(
            torch.arange(t)
        )[None]
        for norm, block in self.attn_layers.layers:
            x = block(norm(x)) + x
        return self.norm(x)


@pytest.fixture(scope="module")
def bert_pair():
    cfg = BERTConfig.tiny()
    oracle = _randomize(TorchBERT(cfg), seed=11).eval()
    sd = oracle.state_dict()
    assert "pos_emb.emb.weight" in sd
    assert any(k.startswith("attn_layers.layers.0.1.to_q") for k in sd)
    assert any(k.startswith("attn_layers.layers.1.1.net.0.0") for k in sd)
    params = convert_bert(sd)
    return cfg, oracle, BERTEmbedder(cfg), params


def test_bert_structure(bert_pair):
    cfg, _, model, params = bert_pair
    template = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 7), jnp.int32)
    )
    problems = validate_against(template, params)
    assert not problems, problems


def test_bert_round_trip(bert_pair):
    cfg, oracle, model, params = bert_pair
    rng = np.random.default_rng(12)
    toks = rng.integers(0, cfg.vocab_size, (2, 9))
    with torch.no_grad():
        ref = oracle(torch.tensor(toks, dtype=torch.long)).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def test_bert_unknown_key_raises():
    with pytest.raises(KeyError):
        convert_bert({"attn_layers.layers.0.1.mystery.weight":
                      np.zeros((4, 4))})


# --------------------------------------------------------------------------
# Full-checkpoint split + LitEma preference
# --------------------------------------------------------------------------

def test_split_and_ema_preference(ldm_unet_pair, vq_pair, bert_pair):
    _, unet_oracle, _, _ = ldm_unet_pair
    vq_oracle, _, _ = vq_pair
    _, bert_oracle, _, _ = bert_pair
    sd = {}
    for k, v in unet_oracle.state_dict().items():
        sd[f"model.diffusion_model.{k}"] = v.numpy()
    for k, v in vq_oracle.state_dict().items():
        sd[f"first_stage_model.{k}"] = v.numpy()
    for k, v in bert_oracle.state_dict().items():
        sd[f"cond_stage_model.transformer.{k}"] = v.numpy()
    # LitEma shadow for ONE UNet weight: name = param path, dots stripped
    ema_val = np.full_like(sd["model.diffusion_model.time_embed.0.weight"],
                           0.125)
    sd["model_ema.diffusion_modeltime_embed0weight"] = ema_val
    sd["model_ema.decay"] = np.asarray(0.9999)
    # derived buffers that must be ignored
    sd["betas"] = np.linspace(1e-4, 2e-2, 10).astype(np.float32)

    trees = convert_ldm_checkpoint(sd)
    assert set(trees) == {"unet", "vq", "bert"}
    got = trees["unet"]["params"]["time_embed_0"]["kernel"]
    np.testing.assert_allclose(got, ema_val.T)  # EMA preferred

    trees_raw = convert_ldm_checkpoint(sd, use_ema=False)
    got_raw = trees_raw["unet"]["params"]["time_embed_0"]["kernel"]
    np.testing.assert_allclose(
        got_raw, sd["model.diffusion_model.time_embed.0.weight"].T
    )

    unet_sd, vq_sd, bert_sd = split_ldm_state_dict(sd)
    assert "time_embed.0.weight" in unet_sd
    assert "quantize.embedding.weight" in vq_sd
    assert "token_emb.weight" in bert_sd
    assert not any(k.startswith("model_ema") for k in unet_sd)


def test_split_rejects_non_ldm():
    with pytest.raises(ValueError):
        convert_ldm_checkpoint({"model.diffusion_model.x.weight":
                                np.zeros((2, 2))})
