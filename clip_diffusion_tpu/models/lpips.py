"""LPIPS perceptual loss (VGG16 backbone) in Flax.

The reference uses the lpips pip package's VGG variant as a module-level
singleton (reference sample.py:52, losses.py:38-40) to pull init-image
generations toward the reference image.  Reimplemented: VGG16 feature
extraction at relu{1_2,2_2,3_3,4_3,5_3}, per-location channel unit
normalization, squared differences, learned 1x1 "lin" heads, spatial mean,
sum over stages — the exact LPIPS formula.

Weights: torch `lpips` checkpoints convert via `convert_lpips`; random init
preserves program shape for tests/benches.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# channels per VGG16 stage used by LPIPS
_STAGES = (64, 128, 256, 512, 512)
_CONVS_PER_STAGE = (2, 2, 3, 3, 3)

# lpips "scaling layer" constants (shift/scale applied to [-1,1] inputs)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 conv tower, returning the five LPIPS stages (post-ReLU)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        feats = []
        conv_id = 0
        for stage, (ch, n_convs) in enumerate(zip(_STAGES, _CONVS_PER_STAGE)):
            for _ in range(n_convs):
                x = nn.Conv(
                    ch, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{conv_id}",
                )(x)
                x = nn.relu(x)
                conv_id += 1
            feats.append(x)
            if stage < len(_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg') equivalent: (x, y) NHWC in [-1,1] -> (B,)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        vgg = VGG16Features(self.dtype, name="vgg")
        fx = vgg((x - shift) / scale)
        fy = vgg((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10
            )
            b = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10
            )
            d = (a - b) ** 2
            w = nn.Conv(
                1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin{i}"
            )(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def convert_lpips(state_dict) -> dict:
    """torch `lpips` state dict -> flax params.

    torch keys: net.slice{s}.{idx}.weight/bias (VGG convs by torchvision
    feature index) and lin{i}.model.1.weight (1x1 heads)."""
    from clip_diffusion_tpu.models.convert import _np, _set, conv_kernel

    # torchvision VGG16 feature indices of convs, per slice
    params: dict = {}
    conv_id = 0
    for s, n_convs in enumerate(_CONVS_PER_STAGE):
        # conv indices within each lpips slice module are preserved from
        # torchvision.features; gather in order
        slice_keys = sorted(
            {
                int(k.split(".")[2])
                for k in state_dict
                if k.startswith(f"net.slice{s + 1}.") and k.endswith("weight")
            }
        )
        assert len(slice_keys) == n_convs, (s, slice_keys)
        for idx in slice_keys:
            w = state_dict[f"net.slice{s + 1}.{idx}.weight"]
            b = state_dict[f"net.slice{s + 1}.{idx}.bias"]
            _set(params, ("vgg", f"conv{conv_id}", "kernel"), conv_kernel(w))
            _set(params, ("vgg", f"conv{conv_id}", "bias"), _np(b))
            conv_id += 1
    for i in range(5):
        w = state_dict[f"lin{i}.model.1.weight"]
        _set(params, (f"lin{i}", "kernel"), conv_kernel(w))
    return {"params": params}


# torchvision VGG16 `features` indices of the 13 convs (pools at 4,9,16,23)
_TORCHVISION_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_lpips_parts(vgg_state_dict, lin_state_dict) -> dict:
    """Deploy-artifact variant of `convert_lpips`: the torchvision VGG16
    backbone (`features.N.weight`, download.pytorch.org vgg16-397923af) plus
    the lpips repo's standalone lin-head weights (`lin{i}.model.1.weight`,
    weights/v0.1/vgg.pth) — the two files the lpips pip package itself
    assembles at import (reference sample.py:52)."""
    from clip_diffusion_tpu.models.convert import _np, _set, conv_kernel

    params: dict = {}
    for conv_id, idx in enumerate(_TORCHVISION_VGG16_CONV_IDX):
        _set(params, ("vgg", f"conv{conv_id}", "kernel"),
             conv_kernel(vgg_state_dict[f"features.{idx}.weight"]))
        _set(params, ("vgg", f"conv{conv_id}", "bias"),
             _np(vgg_state_dict[f"features.{idx}.bias"]))
    for i in range(5):
        _set(params, (f"lin{i}", "kernel"),
             conv_kernel(lin_state_dict[f"lin{i}.model.1.weight"]))
    return {"params": params}
