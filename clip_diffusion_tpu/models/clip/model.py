"""OpenAI-CLIP model family in Flax (ViT-B/32, ViT-B/16, ViT-L/14, RN50,
RN101) — the four perceptors the reference loads via `clip.load` (reference
models.py:74-84, config.py:41) plus RN50 (BASELINE config 3).

Structural parity with the released checkpoints (for weight conversion):
packed qkv projections (`in_proj`), QuickGELU MLPs, pre-LN transformer
blocks, EOT-position text pooling, and for the ResNets the "modified"
3-conv stem, antialiased avg-pool downsampling, and attention pooling.

TPU adaptations: NHWC convs, bf16 matmuls with fp32 LayerNorm/softmax,
`remat` option for the guidance VJP.  Image inputs are [0,1] RGB; apply
`clip_normalize` first (the reference normalizes inside embed_image,
functional.py:97-102 with the constants at functional.py:16-18).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.models.clip.tokenizer import CONTEXT_LENGTH, VOCAB_SIZE

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_normalize(images01):
    """[0,1] NHWC -> CLIP-normalized (reference functional.py:16-26)."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images01.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images01.dtype)
    return (images01 - mean) / std


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    name: str
    embed_dim: int
    image_resolution: int
    # vision: ViT if vision_patch_size set, else ModifiedResNet
    vision_layers: Tuple[int, ...] | int
    vision_width: int
    vision_patch_size: Optional[int]
    vision_heads: int
    # text
    context_length: int = CONTEXT_LENGTH
    vocab_size: int = VOCAB_SIZE
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @property
    def is_vit(self) -> bool:
        return self.vision_patch_size is not None


CLIP_PRESETS = {
    "ViT-B/32": CLIPConfig("ViT-B/32", 512, 224, 12, 768, 32, 12),
    "ViT-B/16": CLIPConfig("ViT-B/16", 512, 224, 12, 768, 16, 12),
    "ViT-L/14": CLIPConfig(
        "ViT-L/14", 768, 224, 24, 1024, 14, 16,
        text_width=768, text_heads=12, text_layers=12,
    ),
    "RN50": CLIPConfig("RN50", 1024, 224, (3, 4, 6, 3), 64, None, 32),
    "RN101": CLIPConfig("RN101", 512, 224, (3, 4, 23, 3), 64, None, 32),
}


def tiny_clip_config(name: str = "tiny", resnet: bool = False) -> CLIPConfig:
    """Small config with the same topology, for tests."""
    if resnet:
        return CLIPConfig(
            name, 64, 64, (1, 1, 1, 1), 8, None, 4,
            text_width=32, text_heads=2, text_layers=2,
        )
    return CLIPConfig(
        name, 64, 32, 2, 64, 16, 4, text_width=32, text_heads=2, text_layers=2
    )


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormF32(nn.Module):
    """LayerNorm computed in float32 (CLIP fp16 checkpoints do the same)."""

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(
            x.astype(jnp.float32)
        ).astype(orig)


# NOTE (round-3 measurement): a custom-vjp softmax that saved the bf16-cast
# output as its backward residual (halving the f32 attention-probability
# residuals) was tried here and measured SLOWER on the chip — ViT-L/14
# fwd+bwd over 64 cuts 302.5 -> 315.5 ms — because the opaque custom VJP
# blocks XLA's fused softmax backward.  Keep the stock softmax.
class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention layout: packed in_proj + out_proj."""

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, _ = x.shape
        d = self.width // self.heads
        # packed as [q; k; v] blocks like torch MultiheadAttention in_proj
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, self.heads, d)
        k = k.reshape(b, t, self.heads, d)
        v = v.reshape(b, t, self.heads, d)
        # logits in the COMPUTE dtype (bf16 in production): the MXU
        # accumulates QK^T in f32 either way, but storing the (b,h,t,s)
        # logits at model dtype instead of f32 halves the dominant
        # attention HBM traffic — ViT-L/14 fwd+bwd over 64 cuts 302.5 ->
        # 261.5 ms measured.  Softmax still reduces in f32 (cast below).
        # Matches the reference's fp16 attention (CLIP under torch
        # .half(): fp16 logits, f32-internal softmax).  The scale is a
        # power-of-two reciprocal (d in {16, 64}), so it is exact in
        # either dtype; f32 configs (tests/goldens) are bit-identical to
        # the previous f32-logits form.
        logits = jnp.einsum("bthd,bshd->bhts", q, k) * jnp.asarray(
            1.0 / np.sqrt(d), self.dtype
        )
        if mask is not None:
            logits = logits + mask.astype(logits.dtype)
        attn = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1
        ).astype(self.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, t, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + MultiheadAttention(
            self.width, self.heads, self.dtype, name="attn"
        )(LayerNormF32(name="ln_1")(x), mask)
        y = LayerNormF32(name="ln_2")(x)
        y = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, dtype=self.dtype, name="mlp_c_proj")(y)
        return x + y


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        block = (
            nn.remat(ResidualAttentionBlock)
            if self.remat
            else ResidualAttentionBlock
        )
        for i in range(self.layers):
            x = block(
                self.width, self.heads, self.dtype, name=f"resblocks_{i}"
            )(x, mask)
        return x


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding as reshape + matmul.

    Mathematically identical to `nn.Conv(width, (p,p), strides=(p,p))` with
    the same HWIO kernel (param path/shape unchanged -> converted OpenAI
    conv1 weights load as-is), but the stride-p conv's INPUT-gradient
    lowers to a dilated conv that runs at ~21 TFLOP/s on this chip, while
    the identical math as a matmul VJP rides the MXU at full rate — the
    guidance path differentiates through the towers every step, so this is
    one of the hot VJPs (measured: ViT-B/16 fwd+bwd over 64 cuts 137 ms as
    conv vs ~60 ms as matmul)."""

    width: int
    patch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        p = self.patch
        b, h, w, c = images.shape
        gh, gw = h // p, w // p
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c, self.width),
            jnp.float32,
        ).astype(self.dtype)
        x = images.astype(self.dtype).reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        return x @ kernel.reshape(p * p * c, self.width)


class VisionTransformer(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, images):
        c = self.cfg
        p = c.vision_patch_size
        x = PatchEmbed(c.vision_width, p, c.dtype, name="conv1")(images)
        b, n_patches, w = x.shape
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (w,), jnp.float32
        ).astype(c.dtype)
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (n_patches + 1, w),
            jnp.float32,
        ).astype(c.dtype)
        x = x + pos
        x = LayerNormF32(name="ln_pre")(x)
        x = Transformer(
            w, c.vision_layers, c.vision_heads, c.dtype, c.remat,
            name="transformer",
        )(x)
        x = LayerNormF32(name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (w, c.embed_dim), jnp.float32
        ).astype(c.dtype)
        return x @ proj


class Bottleneck(nn.Module):
    """ModifiedResNet bottleneck: all downsampling is a stride-1 conv
    preceded by avg-pool (anti-aliased), expansion 4."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name=name
        )
        out = nn.relu(bn("bn1")(
            nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        ))
        out = nn.relu(bn("bn2")(
            nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(out)
        ))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = bn("bn3")(
            nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(out)
        )
        identity = x
        if self.stride > 1 or x.shape[-1] != self.planes * 4:
            identity = _avg_pool(x, self.stride) if self.stride > 1 else x
            identity = nn.Conv(
                self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                name="downsample_conv",
            )(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


def _avg_pool(x, stride):
    if stride == 1:
        return x
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, stride, stride, 1), (1, stride, stride, 1),
        "VALID",
    ) / (stride * stride)


class AttentionPool2d(nn.Module):
    embed_dim: int
    heads: int
    output_dim: int
    spacial_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.spacial_dim**2 + 1, c),
            jnp.float32,
        ).astype(x.dtype)
        x = x + pos
        d = self.embed_dim // self.heads
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(x[:, :1])
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, 1, self.heads, d)
        k = k.reshape(b, -1, self.heads, d)
        v = v.reshape(b, -1, self.heads, d)
        logits = jnp.einsum(
            "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
        ) * np.float32(1.0 / np.sqrt(d))
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, 1, self.embed_dim)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0]


class ModifiedResNet(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, images, train: bool = False):
        c = self.cfg
        width = c.vision_width
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name=name
        )
        x = images.astype(c.dtype)
        x = nn.relu(bn("bn1")(nn.Conv(
            width // 2, (3, 3), strides=(2, 2), padding=1, use_bias=False,
            dtype=c.dtype, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(
            width // 2, (3, 3), padding=1, use_bias=False, dtype=c.dtype,
            name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Conv(
            width, (3, 3), padding=1, use_bias=False, dtype=c.dtype,
            name="conv3")(x)))
        x = _avg_pool(x, 2)

        for li, blocks in enumerate(c.vision_layers):
            planes = width * (2**li)
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                x = Bottleneck(
                    planes, stride if bi == 0 else 1, c.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train)

        heads = width * 32 // 64
        return AttentionPool2d(
            embed_dim=width * 32,
            heads=heads,
            output_dim=c.embed_dim,
            spacial_dim=c.image_resolution // 32,
            dtype=c.dtype,
            name="attnpool",
        )(x)


class CLIPModel(nn.Module):
    """Both towers.  Use apply(..., method=CLIPModel.encode_image/text)."""

    cfg: CLIPConfig

    def setup(self):
        c = self.cfg
        if c.is_vit:
            self.visual = VisionTransformer(c)
        else:
            self.visual = ModifiedResNet(c)
        self.token_embedding = nn.Embed(
            c.vocab_size, c.text_width, dtype=c.dtype,
            embedding_init=nn.initializers.normal(0.02),
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.context_length, c.text_width),
            jnp.float32,
        )
        self.text_transformer = Transformer(
            c.text_width, c.text_layers, c.text_heads, c.dtype, c.remat,
            name="transformer",
        )
        self.ln_final = LayerNormF32()
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(0.02),
            (c.text_width, c.embed_dim),
            jnp.float32,
        )

    def encode_image(self, images):
        """CLIP-normalized NHWC images -> (B, embed_dim) float32."""
        return self.visual(images).astype(jnp.float32)

    def encode_text(self, tokens):
        """(B, 77) int token ids -> (B, embed_dim) float32, EOT-pooled."""
        c = self.cfg
        x = self.token_embedding(tokens)
        x = x + self.positional_embedding.astype(x.dtype)
        t = tokens.shape[1]
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, dtype=jnp.float32), k=1)
        x = self.text_transformer(x, mask)
        x = self.ln_final(x)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        return (pooled @ self.text_projection.astype(pooled.dtype)).astype(
            jnp.float32
        )

    def __call__(self, images, tokens):
        return self.encode_image(images), self.encode_text(tokens)
