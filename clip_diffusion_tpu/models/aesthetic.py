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


def make_aesthetic_predictor(clip_model_name: str) -> nn.Module:
    """Pick the head architecture the reference pairs with each CLIP model
    (reference models.py:220-230: 768-d -> MLP, else linear)."""
    if CLIP_DIMS[clip_model_name] == 768:
        return MLPAestheticPredictor()
    return LinearAestheticPredictor()
