"""torch-checkpoint -> Flax parameter conversion.

The reference's model zoo loads public torch checkpoints (URLs at reference
models.py:11-30); this module maps their state dicts onto the Flax trees of
models/unet.py and models/clip/model.py.  Layout rules:

* Conv2d (O, I, kh, kw)      -> flax Conv kernel (kh, kw, I, O)
* Conv1d (O, I, 1) (ADM qkv) -> flax Dense kernel (I, O)
* Linear (O, I)              -> flax Dense kernel (I, O)
* {Group,Layer,Batch}Norm weight/bias -> scale/bias (+ batch_stats for BN)
* torch MultiheadAttention packed in_proj ([q;k;v] rows) maps directly: the
  flax modules were laid out to match (see models/clip/model.py and the
  per-head-block ADM qkv note in models/unet.py).

Activation-level parity of each layer family is tested against torch.nn in
tests/test_convert.py (SURVEY.md §7 "weight-porting fidelity").
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def _np(t):
    """torch tensor / array-like -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def conv1d_as_dense(w) -> np.ndarray:
    return _np(w)[:, :, 0].T


def linear_kernel(w) -> np.ndarray:
    return _np(w).T


def _set(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# --------------------------------------------------------------------------
# ADM UNet
# --------------------------------------------------------------------------

_UNET_PLAIN_CONVS = {"in_layers.2": "in_layers_2", "out_layers.3": "out_layers_3",
                     "skip_connection": "skip_connection", "op": "op",
                     "conv": "conv"}
_UNET_NORMS = {"in_layers.0": "in_layers_0", "out_layers.0": "out_layers_0",
               "norm": "norm"}


def convert_unet(state_dict: Mapping[str, "np.ndarray"]) -> dict:
    """ADM torch state dict -> {'params': ...} for models.unet.UNetModel."""
    params: dict = {}
    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        leaf = parts[-1]  # weight | bias
        if parts[0] == "time_embed":
            block = f"time_embed_{parts[1]}"
            _set(params, (block, "kernel" if leaf == "weight" else "bias"),
                 linear_kernel(val) if leaf == "weight" else _np(val))
            continue
        if parts[0] == "out":
            if parts[1] == "0":
                _set(params, ("out_0", "GroupNorm_0",
                              "scale" if leaf == "weight" else "bias"), _np(val))
            else:
                _set(params, ("out_2", "kernel" if leaf == "weight" else "bias"),
                     conv_kernel(val) if leaf == "weight" else _np(val))
            continue
        # input_blocks.N.M... / middle_block.M... / output_blocks.N.M...
        if parts[0] == "middle_block":
            block = f"middle_block_{parts[1]}"
            rest = ".".join(parts[2:-1])
        else:
            block = f"{parts[0]}_{parts[1]}_{parts[2]}"
            rest = ".".join(parts[3:-1])

        if rest == "" :  # input_blocks.0.0 stem conv
            _set(params, (block, "kernel" if leaf == "weight" else "bias"),
                 conv_kernel(val) if leaf == "weight" else _np(val))
        elif rest in _UNET_NORMS:
            _set(params, (block, _UNET_NORMS[rest], "GroupNorm_0",
                          "scale" if leaf == "weight" else "bias"), _np(val))
        elif rest in _UNET_PLAIN_CONVS:
            _set(params, (block, _UNET_PLAIN_CONVS[rest],
                          "kernel" if leaf == "weight" else "bias"),
                 conv_kernel(val) if leaf == "weight" else _np(val))
        elif rest == "emb_layers.1":
            _set(params, (block, "emb_layers_1",
                          "kernel" if leaf == "weight" else "bias"),
                 linear_kernel(val) if leaf == "weight" else _np(val))
        elif rest in ("qkv", "proj_out"):
            _set(params, (block, rest, "kernel" if leaf == "weight" else "bias"),
                 conv1d_as_dense(val) if leaf == "weight" else _np(val))
        else:
            raise KeyError(f"unmapped UNet key: {key}")
    return {"params": params}


# --------------------------------------------------------------------------
# CLIP
# --------------------------------------------------------------------------

def _convert_transformer_key(params, parts, leaf, val, prefix):
    """(visual.)transformer.resblocks.N.<sub> keys."""
    n = parts[2]
    block = prefix + (f"resblocks_{n}",)
    sub = parts[3]
    if sub in ("ln_1", "ln_2"):
        _set(params, block + (sub, "LayerNorm_0",
                              "scale" if leaf == "weight" else "bias"), _np(val))
    elif sub == "attn":
        if parts[4].startswith("in_proj"):
            _set(params, block + ("attn", "in_proj",
                                  "kernel" if "weight" in parts[4] else "bias"),
                 linear_kernel(val) if "weight" in parts[4] else _np(val))
        else:  # out_proj.weight/bias
            _set(params, block + ("attn", "out_proj",
                                  "kernel" if leaf == "weight" else "bias"),
                 linear_kernel(val) if leaf == "weight" else _np(val))
    elif sub == "mlp":
        name = {"c_fc": "mlp_c_fc", "c_proj": "mlp_c_proj"}[parts[4]]
        _set(params, block + (name, "kernel" if leaf == "weight" else "bias"),
             linear_kernel(val) if leaf == "weight" else _np(val))
    else:
        raise KeyError(f"unmapped transformer key: {'.'.join(parts)}")


def convert_clip(state_dict: Mapping[str, "np.ndarray"]) -> dict:
    """OpenAI CLIP torch state dict -> {'params':..., 'batch_stats':...}."""
    params: dict = {}
    stats: dict = {}
    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked") or key == "logit_scale":
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "visual":
            vparts = parts[1:]
            if vparts[0] == "transformer":
                _convert_transformer_key(
                    params, parts[1:], leaf, val, ("visual", "transformer")
                )
            elif vparts[0] in ("class_embedding", "positional_embedding", "proj"):
                _set(params, ("visual", vparts[0]), _np(val))
            elif vparts[0] in ("ln_pre", "ln_post"):
                _set(params, ("visual", vparts[0], "LayerNorm_0",
                              "scale" if leaf == "weight" else "bias"), _np(val))
            elif vparts[0] == "conv1" and len(vparts) == 2:
                _set(params, ("visual", "conv1", "kernel"), conv_kernel(val))
            elif re.fullmatch(r"conv[123]", vparts[0]):
                _set(params, ("visual", vparts[0],
                              "kernel" if leaf == "weight" else "bias"),
                     conv_kernel(val) if leaf == "weight" else _np(val))
            elif re.fullmatch(r"bn[123]", vparts[0]):
                _convert_bn(params, stats, ("visual", vparts[0]), leaf, val)
            elif vparts[0] == "attnpool":
                if vparts[1] == "positional_embedding":
                    _set(params, ("visual", "attnpool", "positional_embedding"),
                         _np(val))
                else:
                    _set(params, ("visual", "attnpool", vparts[1],
                                  "kernel" if leaf == "weight" else "bias"),
                         linear_kernel(val) if leaf == "weight" else _np(val))
            elif re.fullmatch(r"layer[1-4]", vparts[0]):
                block = ("visual", f"{vparts[0]}_{vparts[1]}")
                sub = vparts[2]
                if sub.startswith("conv"):
                    _set(params, block + (sub, "kernel"), conv_kernel(val))
                elif sub.startswith("bn"):
                    _convert_bn(params, stats, block + (sub,), leaf, val)
                elif sub == "downsample":
                    if vparts[3] == "0":
                        _set(params, block + ("downsample_conv", "kernel"),
                             conv_kernel(val))
                    else:
                        _convert_bn(params, stats, block + ("downsample_bn",),
                                    leaf, val)
                else:
                    raise KeyError(f"unmapped resnet key: {key}")
            else:
                raise KeyError(f"unmapped visual key: {key}")
        elif parts[0] == "transformer":
            _convert_transformer_key(params, parts, leaf, val, ("transformer",))
        elif parts[0] == "token_embedding":
            _set(params, ("token_embedding", "embedding"), _np(val))
        elif parts[0] in ("positional_embedding", "text_projection"):
            _set(params, (parts[0],), _np(val))
        elif parts[0] == "ln_final":
            _set(params, ("ln_final", "LayerNorm_0",
                          "scale" if leaf == "weight" else "bias"), _np(val))
        else:
            raise KeyError(f"unmapped CLIP key: {key}")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _convert_bn(params, stats, path, leaf, val):
    if leaf == "weight":
        _set(params, path + ("scale",), _np(val))
    elif leaf == "bias":
        _set(params, path + ("bias",), _np(val))
    elif leaf == "running_mean":
        _set(stats, path + ("mean",), _np(val))
    elif leaf == "running_var":
        _set(stats, path + ("var",), _np(val))
    else:
        raise KeyError(f"unmapped BN leaf: {leaf}")


# --------------------------------------------------------------------------
# Checkpoint IO + shape validation
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into numpy (torch is a host-side,
    conversion-only dependency)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict):
        # common release wrappings: lightning ("state_dict"), basicsr
        # ("params_ema"/"params")
        for wrap in ("state_dict", "params_ema", "params"):
            if wrap in sd and isinstance(sd[wrap], dict):
                sd = sd[wrap]
                break
    return {k: _np(v) for k, v in sd.items()}


def validate_against(template: dict, converted: dict, path=()):
    """Recursively assert the converted tree matches a model-init template's
    structure and shapes; returns mismatches instead of raising."""
    problems = []
    tkeys = set(template)
    ckeys = set(converted)
    for k in tkeys - ckeys:
        problems.append(f"missing {'/'.join(path + (k,))}")
    for k in ckeys - tkeys:
        problems.append(f"unexpected {'/'.join(path + (k,))}")
    for k in tkeys & ckeys:
        tv, cv = template[k], converted[k]
        if isinstance(tv, dict):
            problems += validate_against(tv, cv, path + (k,))
        else:
            if tuple(tv.shape) != tuple(np.shape(cv)):
                problems.append(
                    f"shape {'/'.join(path + (k,))}: "
                    f"expected {tuple(tv.shape)} got {tuple(np.shape(cv))}"
                )
    return problems
