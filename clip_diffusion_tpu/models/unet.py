"""ADM ("guided diffusion") UNet in Flax, TPU-first.

Reimplements the architecture the reference instantiates through
`create_model_and_diffusion` (reference models.py:95-116): the 512^2
unconditional ImageNet UNet — 256 base channels, channel mult
(0.5,1,1,2,2,4,4), 2 res blocks/level, attention at downsample factors
{16,32,64} (= "32,16,8" pixel resolutions), 64 head channels,
ResBlock-based up/downsampling, scale-shift GroupNorm conditioning,
learn_sigma (6 output channels) — ~552M parameters.

TPU adaptations (design, not translation):
* NHWC layout end to end (TPU conv-native); checkpoints converted from the
  reference's NCHW torch weights by models/convert.py.
* bfloat16 compute with float32 GroupNorm statistics and float32 attention
  softmax (mirrors the reference's fp16-with-fp32-norms recipe at a dtype
  the MXU natively supports).
* `use_checkpoint=True` (reference models.py:112) becomes `nn.remat` over
  ResBlock/AttentionBlock bodies.
* module names mirror the torch state-dict paths (input_blocks_3_0 etc.) so
  weight conversion is mechanical.

Timestep inputs follow rescale_timesteps=True semantics: the model consumes
base-process timesteps scaled into [0, 1000) (reference models.py:103);
`NoiseSchedule.scaled_timesteps` provides them.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    image_size: int = 512
    in_channels: int = 3
    model_channels: int = 256
    out_channels: int = 6  # learn_sigma -> eps + variance interpolation
    num_res_blocks: int = 2
    attention_ds: Tuple[int, ...] = (16, 32, 64)  # 512/(32,16,8)
    channel_mult: Tuple[float, ...] = (0.5, 1, 1, 2, 2, 4, 4)
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True
    # rematerialization policy for the VJP through the UNet:
    # "full" recomputes everything (minimum HBM); "dots" saves matmul/conv
    # results (jax.checkpoint_policies.dots_with_no_batch_dims_saveable —
    # less recompute, more activation memory)
    remat_policy: str = "full"

    @staticmethod
    def for_image_size(image_size: int, **kw) -> "UNetConfig":
        """channel_mult / attention defaults per guided-diffusion
        script_util for each canvas size."""
        mults = {
            512: (0.5, 1, 1, 2, 2, 4, 4),
            256: (1, 1, 2, 2, 4, 4),
            128: (1, 1, 2, 3, 4),
            64: (1, 2, 3, 4),
        }[image_size]
        attn = tuple(image_size // r for r in (32, 16, 8))
        return UNetConfig(
            image_size=image_size, channel_mult=mults, attention_ds=attn, **kw
        )

    @staticmethod
    def tiny(image_size: int = 32) -> "UNetConfig":
        """Small config with the same topology knobs, for tests/CI."""
        return UNetConfig(
            image_size=image_size,
            model_channels=32,
            channel_mult=(1, 2),
            attention_ds=(2,),
            num_head_channels=16,
            dtype=jnp.float32,
            remat=False,
        )


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, guided-diffusion convention: cat(cos, sin)."""
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class _FastGroupNormCore(nn.Module):
    """bf16 GroupNorm with f32 statistics: the two stat reductions
    accumulate in f32 (XLA fuses the per-element convert into the reduce,
    so no full-shape f32 tensor ever hits HBM), the per-(batch, channel)
    affine `a = scale*rsqrt(var+eps)`, `b = bias - mean*a` is computed in
    f32 on tiny tensors, and the only full-tensor op is ONE bf16 fused
    multiply-add.  Declares the same `{scale, bias}` params as
    `nn.GroupNorm` so checkpoints/converters see an identical tree."""

    groups: int
    eps: float

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        cg = c // self.groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        b = x.shape[0]
        xg = x.reshape(b, -1, self.groups, cg)
        m = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)
        m2 = jnp.mean(
            jnp.square(xg.astype(jnp.float32)), axis=(1, 3)
        )
        inv = jax.lax.rsqrt(jnp.maximum(m2 - m * m, 0.0) + self.eps)
        a = scale.reshape(self.groups, cg)[None] * inv[:, :, None]
        bb = bias.reshape(self.groups, cg)[None] - m[:, :, None] * a
        a = a.reshape(b, c).astype(x.dtype)
        bb = bb.reshape(b, c).astype(x.dtype)
        expand = (slice(None),) + (None,) * (x.ndim - 2) + (slice(None),)
        return x * a[expand] + bb[expand]


class GroupNorm32(nn.Module):
    """GroupNorm(32) with float32 statistics regardless of compute dtype.
    (Falls back to fewer groups only for sub-32-channel test configs.)
    `eps` is 1e-5 for ADM/openaimodel norms; CompVis/taming `Normalize`
    layers (spatial transformer + VQ autoencoder) use 1e-6.

    bf16 inputs take the fused fast path (`_FastGroupNormCore`): f32
    stats, bf16 normalization FMA — same param tree, measured whole-UNet
    win (see STATUS.md round-4 MFU table).  f32 inputs keep the legacy
    `nn.GroupNorm` computation bit-identical (golden/convert suites)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        groups = min(32, x.shape[-1])
        if x.shape[-1] % groups != 0:
            # fail loudly at trace time: flax's GroupNorm would raise a
            # less specific error, and the bf16 fast path silently falling
            # through here would be even more confusing (ADVICE r4)
            raise ValueError(
                f"GroupNorm32: channel count {x.shape[-1]} is not divisible "
                f"by num_groups={groups}; ADM/LDM channel widths must be "
                "multiples of min(32, channels)"
            )
        if orig == jnp.bfloat16 and x.shape[-1] % groups == 0:
            return _FastGroupNormCore(
                groups=groups, eps=self.eps, name="GroupNorm_0"
            )(x)
        x = nn.GroupNorm(num_groups=groups, epsilon=self.eps,
                         dtype=jnp.float32)(x.astype(jnp.float32))
        return x.astype(orig)


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _nearest_up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Downsample(nn.Module):
    channels: int
    use_conv: bool
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(
                self.channels, (3, 3), strides=(2, 2), padding=1,
                dtype=self.dtype, name="op",
            )(x)
        return _avg_pool2(x)


class Upsample(nn.Module):
    channels: int
    use_conv: bool
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = _nearest_up2(x)
        if self.use_conv:
            x = nn.Conv(
                self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv"
            )(x)
        return x


class ResBlock(nn.Module):
    """ADM residual block with scale-shift-norm time conditioning and
    optional fused up/downsampling (resblock_updown)."""

    out_channels: int
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        h = GroupNorm32(name="in_layers_0")(x)
        h = nn.silu(h)
        if self.up:
            h = _nearest_up2(h)
            x = _nearest_up2(x)
        elif self.down:
            h = _avg_pool2(h)
            x = _avg_pool2(x)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            name="in_layers_2",
        )(h)

        emb_width = (
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        )
        emb_out = nn.Dense(emb_width, dtype=self.dtype, name="emb_layers_1")(
            nn.silu(emb)
        )[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_layers_0")(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = GroupNorm32(name="out_layers_0")(h)
            h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=True)(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="out_layers_3",
        )(h)

        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype,
                name="skip_connection",
            )(x)
        return x + h


class AttentionBlock(nn.Module):
    """Self-attention over flattened spatial positions, float32 softmax."""

    num_head_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = c // self.num_head_channels
        d = self.num_head_channels
        y = GroupNorm32(name="norm")(x).reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, h * w, heads, 3 * d), 3, axis=-1)
        # Logits at the COMPUTE dtype (bf16 in production): the MXU
        # accumulates QK^T in f32 either way, but storing the (b,h,t,s)
        # logits at model dtype instead of f32 halves attention HBM
        # traffic (same change measured -13.6% on ViT-L/14 fwd+bwd in
        # models/clip/model.py).  The scale must be a scalar of
        # self.dtype — a bare np.sqrt() float64 is strongly typed and
        # silently promotes bf16 logits back to f32.  Division (not
        # multiply-by-reciprocal) keeps f32 configs (tests/goldens)
        # bit-identical for non-power-of-two head dims.  Softmax still
        # reduces in f32 below.
        logits = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.asarray(
            np.sqrt(d), self.dtype
        )
        attn = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1
        ).astype(self.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, h * w, c)
        out = nn.Dense(
            c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
            name="proj_out",
        )(out)
        return x + out.reshape(b, h, w, c)


class UNetModel(nn.Module):
    """The full ADM UNet.  Input NHWC in [-1,1]; output NHWC with
    `out_channels` (eps + raw variance when learn_sigma)."""

    config: UNetConfig

    @nn.compact
    def __call__(self, x, timesteps):
        cfg = self.config
        ch0 = int(cfg.channel_mult[0] * cfg.model_channels)
        time_dim = cfg.model_channels * 4

        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_embed_0")(
            emb.astype(cfg.dtype)
        )
        emb = nn.Dense(time_dim, dtype=cfg.dtype, name="time_embed_2")(
            nn.silu(emb)
        )

        if cfg.remat:
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if cfg.remat_policy == "dots" else None
            )
            res_block = nn.remat(ResBlock, policy=policy)
            attn_block = nn.remat(AttentionBlock, policy=policy)
        else:
            res_block = ResBlock
            attn_block = AttentionBlock

        x = x.astype(cfg.dtype)
        h = nn.Conv(
            ch0, (3, 3), padding=1, dtype=cfg.dtype, name="input_blocks_0_0"
        )(x)

        skips = [h]
        ch = ch0
        ds = 1
        block_id = 1
        for level, mult in enumerate(cfg.channel_mult):
            out_ch = int(mult * cfg.model_channels)
            for _ in range(cfg.num_res_blocks):
                h = res_block(
                    out_channels=out_ch,
                    use_scale_shift_norm=cfg.use_scale_shift_norm,
                    dropout=cfg.dropout,
                    dtype=cfg.dtype,
                    name=f"input_blocks_{block_id}_0",
                )(h, emb)
                ch = out_ch
                if ds in cfg.attention_ds:
                    h = attn_block(
                        num_head_channels=cfg.num_head_channels,
                        dtype=cfg.dtype,
                        name=f"input_blocks_{block_id}_1",
                    )(h)
                skips.append(h)
                block_id += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = res_block(
                        out_channels=ch,
                        use_scale_shift_norm=cfg.use_scale_shift_norm,
                        down=True,
                        dropout=cfg.dropout,
                        dtype=cfg.dtype,
                        name=f"input_blocks_{block_id}_0",
                    )(h, emb)
                else:
                    h = Downsample(
                        ch, use_conv=True, dtype=cfg.dtype,
                        name=f"input_blocks_{block_id}_0",
                    )(h)
                ds *= 2
                skips.append(h)
                block_id += 1

        h = res_block(
            out_channels=ch,
            use_scale_shift_norm=cfg.use_scale_shift_norm,
            dropout=cfg.dropout,
            dtype=cfg.dtype,
            name="middle_block_0",
        )(h, emb)
        h = attn_block(
            num_head_channels=cfg.num_head_channels, dtype=cfg.dtype,
            name="middle_block_1",
        )(h)
        h = res_block(
            out_channels=ch,
            use_scale_shift_norm=cfg.use_scale_shift_norm,
            dropout=cfg.dropout,
            dtype=cfg.dtype,
            name="middle_block_2",
        )(h, emb)

        block_id = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            out_ch = int(mult * cfg.model_channels)
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = res_block(
                    out_channels=out_ch,
                    use_scale_shift_norm=cfg.use_scale_shift_norm,
                    dropout=cfg.dropout,
                    dtype=cfg.dtype,
                    name=f"output_blocks_{block_id}_0",
                )(h, emb)
                ch = out_ch
                sub = 1
                if ds in cfg.attention_ds:
                    h = attn_block(
                        num_head_channels=cfg.num_head_channels,
                        dtype=cfg.dtype,
                        name=f"output_blocks_{block_id}_1",
                    )(h)
                    sub = 2
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = res_block(
                            out_channels=ch,
                            use_scale_shift_norm=cfg.use_scale_shift_norm,
                            up=True,
                            dropout=cfg.dropout,
                            dtype=cfg.dtype,
                            name=f"output_blocks_{block_id}_{sub}",
                        )(h, emb)
                    else:
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


def split_model_output(out):
    """learn_sigma head: (B,H,W,2C) -> (eps, raw_variance)."""
    c = out.shape[-1] // 2
    return out[..., :c], out[..., c:]
