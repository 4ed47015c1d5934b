"""Latent-diffusion UNet (cross-attention conditioned) in Flax.

The reference's second pipeline drives CompVis LDM txt2img-f8-large — the
1.45B-parameter text-to-image model (reference models.py:134-150, config
`txt2img-1p4B-eval.yaml`): latent UNet with model_channels 320, channel
mult (1,2,4,4), 2 res blocks, SpatialTransformer cross-attention (depth 1,
context dim 1280, 8 heads) at downsample factors {1,2,4}, operating on
4-channel f8 latents.

Reuses the ADM building blocks (ResBlock/Up/Downsample, models/unet.py) —
the architectures share them — and adds the SpatialTransformer stack
(self-attn + cross-attn + GEGLU feed-forward).  NHWC, bf16-ready, remat.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.models.unet import (
    Downsample,
    GroupNorm32,
    ResBlock,
    Upsample,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class LDMUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_ds: Tuple[int, ...] = (1, 2, 4)  # attention_resolutions [4,2,1]
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 1280
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True

    @staticmethod
    def tiny() -> "LDMUNetConfig":
        return LDMUNetConfig(
            model_channels=32,
            channel_mult=(1, 2),
            attention_ds=(1, 2),
            num_heads=2,
            context_dim=16,
            dtype=jnp.float32,
            remat=False,
        )


class CrossAttention(nn.Module):
    """LDM CrossAttention: query from image tokens, key/value from context
    (or from the image tokens themselves for self-attention)."""

    query_dim: int
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, t, _ = q.shape
        s = k.shape[1]
        q = q.reshape(b, t, self.heads, self.dim_head)
        k = k.reshape(b, s, self.heads, self.dim_head)
        v = v.reshape(b, s, self.heads, self.dim_head)
        # logits at model dtype (f32-internal softmax below): halves the
        # (b,h,t,s) attention HBM traffic under bf16; f32 configs are
        # bit-identical to the previous forced-f32-logits form.  The
        # scale must be cast to self.dtype — a bare np.sqrt() float64
        # scalar is strongly typed and promotes bf16 logits to f32.
        # See models/clip/model.py MultiheadAttention for the
        # measurement.
        logits = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.asarray(
            np.sqrt(self.dim_head), self.dtype
        )
        attn = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1
        ).astype(self.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, t, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact gelu: CompVis GEGLU uses torch F.gelu's erf form
        return h * nn.gelu(
            gate.astype(jnp.float32), approximate=False
        ).astype(h.dtype)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       name=name)
        x = x + CrossAttention(
            self.dim, self.heads, self.dim_head, self.dtype, name="attn1"
        )(ln("norm1")(x.astype(jnp.float32)).astype(x.dtype))
        x = x + CrossAttention(
            self.dim, self.heads, self.dim_head, self.dtype, name="attn2"
        )(ln("norm2")(x.astype(jnp.float32)).astype(x.dtype), context)
        h = ln("norm3")(x.astype(jnp.float32)).astype(x.dtype)
        h = GEGLU(self.dim * 4, self.dtype, name="ff_geglu")(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(h)
        return x + h


class SpatialTransformer(nn.Module):
    channels: int
    heads: int
    depth: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        dim_head = c // self.heads
        residual = x
        y = GroupNorm32(eps=1e-6, name="norm")(x)  # CompVis Normalize
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(y)
        y = y.reshape(b, h * w, c)
        for i in range(self.depth):
            y = BasicTransformerBlock(
                c, self.heads, dim_head, self.context_dim, self.dtype,
                name=f"blocks_{i}",
            )(y, context)
        y = y.reshape(b, h, w, c)
        y = nn.Conv(
            c, (1, 1), dtype=self.dtype, kernel_init=nn.initializers.zeros,
            name="proj_out",
        )(y)
        return residual + y


class LDMUNet(nn.Module):
    """eps-model over latents: (x NHWC latents, t (B,), context (B,S,D))."""

    config: LDMUNetConfig

    @nn.compact
    def __call__(self, x, timesteps, context):
        cfg = self.config
        time_dim = cfg.model_channels * 4
        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_embed_0")(
            emb.astype(cfg.dtype)
        )
        emb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_embed_2")(
            nn.silu(emb)
        )

        res_block = nn.remat(ResBlock) if cfg.remat else ResBlock
        attn_block = (
            nn.remat(SpatialTransformer) if cfg.remat else SpatialTransformer
        )

        x = x.astype(cfg.dtype)
        context = context.astype(cfg.dtype)
        h = nn.Conv(
            cfg.model_channels, (3, 3), padding=1, dtype=cfg.dtype,
            name="input_blocks_0_0",
        )(x)

        skips = [h]
        ch = cfg.model_channels
        ds = 1
        block_id = 1
        for level, mult in enumerate(cfg.channel_mult):
            out_ch = mult * cfg.model_channels
            for _ in range(cfg.num_res_blocks):
                h = res_block(
                    out_channels=out_ch, use_scale_shift_norm=False,
                    dtype=cfg.dtype, name=f"input_blocks_{block_id}_0",
                )(h, emb)
                ch = out_ch
                if ds in cfg.attention_ds:
                    h = attn_block(
                        ch, cfg.num_heads, cfg.transformer_depth,
                        cfg.context_dim, cfg.dtype,
                        name=f"input_blocks_{block_id}_1",
                    )(h, context)
                skips.append(h)
                block_id += 1
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(
                    ch, use_conv=True, dtype=cfg.dtype,
                    name=f"input_blocks_{block_id}_0",
                )(h)
                ds *= 2
                skips.append(h)
                block_id += 1

        h = res_block(
            out_channels=ch, use_scale_shift_norm=False, dtype=cfg.dtype,
            name="middle_block_0",
        )(h, emb)
        h = attn_block(
            ch, cfg.num_heads, cfg.transformer_depth, cfg.context_dim,
            cfg.dtype, name="middle_block_1",
        )(h, context)
        h = res_block(
            out_channels=ch, use_scale_shift_norm=False, dtype=cfg.dtype,
            name="middle_block_2",
        )(h, emb)

        block_id = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            out_ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = res_block(
                    out_channels=out_ch, use_scale_shift_norm=False,
                    dtype=cfg.dtype, name=f"output_blocks_{block_id}_0",
                )(h, emb)
                ch = out_ch
                sub = 1
                if ds in cfg.attention_ds:
                    h = attn_block(
                        ch, cfg.num_heads, cfg.transformer_depth,
                        cfg.context_dim, cfg.dtype,
                        name=f"output_blocks_{block_id}_1",
                    )(h, context)
                    sub = 2
                if level and i == cfg.num_res_blocks:
                    h = Upsample(
                        ch, use_conv=True, dtype=cfg.dtype,
                        name=f"output_blocks_{block_id}_{sub}",
                    )(h)
                    ds //= 2
                block_id += 1

        h = GroupNorm32(name="out_0")(h)
        h = nn.silu(h)
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
            kernel_init=nn.initializers.zeros, name="out_2",
        )(h)
        return h.astype(jnp.float32)
