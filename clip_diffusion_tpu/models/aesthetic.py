"""Aesthetic predictor heads over CLIP image embeddings.

The reference loads two checkpoint families (reference models.py:188-240):
a single linear layer for the 512-d ViT-B/32 and ViT-B/16 embeddings
(crowsonkb simulacra-aesthetic-models) and a 768->1024->128->64->16->1 MLP
for ViT-L/14 (improved-aesthetic-predictor).  Dropout layers exist only for
training; inference is deterministic.
"""

from __future__ import annotations

import flax.linen as nn


class LinearAestheticPredictor(nn.Module):
    """One linear layer (reference models.py:188-196)."""

    @nn.compact
    def __call__(self, x):
        return nn.Dense(1, name="linear")(x)


class MLPAestheticPredictor(nn.Module):
    """The improved-aesthetic-predictor MLP (reference models.py:200-217).
    Dropout is inference-disabled."""

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(1024, name="fc0")(x)
        x = nn.Dropout(0.2, deterministic=deterministic)(x)
        x = nn.Dense(128, name="fc1")(x)
        x = nn.Dropout(0.2, deterministic=deterministic)(x)
        x = nn.Dense(64, name="fc2")(x)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.Dense(16, name="fc3")(x)
        x = nn.Dense(1, name="fc4")(x)
        return x


# CLIP embedding widths (reference models.py:33-37).
CLIP_DIMS = {"ViT-B/32": 512, "ViT-B/16": 512, "ViT-L/14": 768}

# torch Sequential index -> flax layer name for the MLP predictor
# (reference models.py:205-214: Linear at 0,2,4,6,7 with Dropouts between)
_MLP_LAYER_MAP = {"0": "fc0", "2": "fc1", "4": "fc2", "6": "fc3", "7": "fc4"}


def convert_aesthetic(state_dict) -> dict:
    """Aesthetic-predictor torch state dict -> flax params.

    Handles both checkpoint families the reference loads with
    `load_state_dict` (reference models.py:220-240): the simulacra linear
    probes (`linear.weight/bias`, crowsonkb; some releases save the bare
    nn.Linear as `weight`/`bias`) and the improved-aesthetic-predictor MLP
    (`layers.{0,2,4,6,7}.weight/bias`)."""
    from clip_diffusion_tpu.models.convert import _np, _set, linear_kernel

    params: dict = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        arr = linear_kernel(val) if leaf == "weight" else _np(val)
        name = "kernel" if leaf == "weight" else "bias"
        if key in ("weight", "bias"):  # bare nn.Linear checkpoint
            _set(params, ("linear", name), arr)
        elif parts[0] == "linear":
            _set(params, ("linear", name), arr)
        elif parts[0] == "layers" and parts[1] in _MLP_LAYER_MAP:
            _set(params, (_MLP_LAYER_MAP[parts[1]], name), arr)
        else:
            raise KeyError(f"unmapped aesthetic key: {key}")
    return {"params": params}


def make_aesthetic_predictor(clip_model_name: str) -> nn.Module:
    """Pick the head architecture the reference pairs with each CLIP model
    (reference models.py:220-230: 768-d -> MLP, else linear)."""
    if CLIP_DIMS[clip_model_name] == 768:
        return MLPAestheticPredictor()
    return LinearAestheticPredictor()
