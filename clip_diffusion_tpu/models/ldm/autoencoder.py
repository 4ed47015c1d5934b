"""VQ-f8 first-stage autoencoder (CompVis/taming) in Flax.

The reference's latent pipeline encodes init images into 4-channel f8
latents and decodes samples back to pixels via the LDM first stage
(reference sample.py:383-388,422; model config `txt2img-1p4B-eval.yaml`
first_stage VQModelInterface: z_channels 4, ch 128, ch_mult (1,2,2,4),
2 res blocks, attention at 32px, codebook 16384 x 4).

Semantics mirrored: `encode` returns the *pre-quantization* continuous
latent after quant_conv (what the diffusion operates on — the torch
VQModelInterface does the same), and `decode` quantizes to the nearest
codebook vector before the decoder.  NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_diffusion_tpu.models.unet import GroupNorm32


@dataclasses.dataclass(frozen=True)
class VQConfig:
    z_channels: int = 4
    embed_dim: int = 4
    n_embed: int = 16384
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (32,)
    resolution: int = 256
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def tiny() -> "VQConfig":
        return VQConfig(
            z_channels=4, embed_dim=4, n_embed=64, ch=16, ch_mult=(1, 2),
            num_res_blocks=1, attn_resolutions=(), resolution=32,
        )


class AEResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(eps=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = GroupNorm32(eps=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class AEAttnBlock(nn.Module):
    """Single-head spatial attention (taming AttnBlock)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm32(eps=1e-6, name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(y).reshape(b, h * w, c)
        logits = jnp.einsum(
            "btc,bsc->bts", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(c))
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bts,bsc->btc", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Encoder(nn.Module):
    cfg: VQConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.ch, (3, 3), padding=1, dtype=c.dtype, name="conv_in")(
            x.astype(c.dtype)
        )
        res = c.resolution
        for level, mult in enumerate(c.ch_mult):
            for i in range(c.num_res_blocks):
                h = AEResnetBlock(c.ch * mult, c.dtype,
                                  name=f"down_{level}_block_{i}")(h)
                if res in c.attn_resolutions:
                    h = AEAttnBlock(c.dtype, name=f"down_{level}_attn_{i}")(h)
            if level != len(c.ch_mult) - 1:
                # taming Downsample: conv stride 2 with asymmetric (0,1) pad
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            padding="VALID", dtype=c.dtype,
                            name=f"down_{level}_downsample")(h)
                res //= 2
        h = AEResnetBlock(h.shape[-1], c.dtype, name="mid_block_1")(h)
        h = AEAttnBlock(c.dtype, name="mid_attn_1")(h)
        h = AEResnetBlock(h.shape[-1], c.dtype, name="mid_block_2")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(c.z_channels, (3, 3), padding=1, dtype=c.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VQConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        block_in = c.ch * c.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=c.dtype,
                    name="conv_in")(z.astype(c.dtype))
        h = AEResnetBlock(block_in, c.dtype, name="mid_block_1")(h)
        h = AEAttnBlock(c.dtype, name="mid_attn_1")(h)
        h = AEResnetBlock(block_in, c.dtype, name="mid_block_2")(h)
        res = c.resolution // (2 ** (len(c.ch_mult) - 1))
        for level in reversed(range(len(c.ch_mult))):
            for i in range(c.num_res_blocks + 1):
                h = AEResnetBlock(c.ch * c.ch_mult[level], c.dtype,
                                  name=f"up_{level}_block_{i}")(h)
                if res in c.attn_resolutions:
                    h = AEAttnBlock(c.dtype, name=f"up_{level}_attn_{i}")(h)
            if level != 0:
                b, hh, ww, cc = h.shape
                h = jnp.broadcast_to(
                    h[:, :, None, :, None, :], (b, hh, 2, ww, 2, cc)
                ).reshape(b, hh * 2, ww * 2, cc)
                h = nn.Conv(cc, (3, 3), padding=1, dtype=c.dtype,
                            name=f"up_{level}_upsample")(h)
                res *= 2
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(c.out_ch, (3, 3), padding=1, dtype=c.dtype,
                       name="conv_out")(h)


class VQModel(nn.Module):
    """encode: pixels [-1,1] NHWC -> continuous latents (pre-quant);
    decode: latents -> pixels [-1,1] (quantizing first, VQModelInterface
    semantics)."""

    cfg: VQConfig

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c)
        self.decoder = Decoder(c)
        self.quant_conv = nn.Conv(c.embed_dim, (1, 1), dtype=c.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(c.z_channels, (1, 1), dtype=c.dtype,
                                       name="post_quant_conv")
        self.codebook = self.param(
            "codebook", nn.initializers.uniform(scale=2.0 / c.n_embed),
            (c.n_embed, c.embed_dim), jnp.float32,
        )

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def quantize(self, z):
        """Nearest codebook vector, straight-through gradient."""
        flat = z.reshape(-1, z.shape[-1]).astype(jnp.float32)
        cb = self.codebook
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2 * flat @ cb.T
            + jnp.sum(cb**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        zq = cb[idx].reshape(z.shape)
        return z + jax.lax.stop_gradient(zq - z)

    def decode(self, z, force_not_quantize: bool = False):
        if not force_not_quantize:
            z = self.quantize(z)
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        return self.decode(self.encode(x))
