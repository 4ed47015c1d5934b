"""CompVis LDM checkpoint -> Flax parameter conversion.

The reference's latent pipeline loads ONE torch checkpoint holding the whole
LatentDiffusion module (reference models.py:134-150: txt2img-f8-large,
jack000 fp16 finetune) whose state dict carries three submodels under fixed
prefixes:

* ``model.diffusion_model.*``   — the cross-attention UNet (openaimodel
  naming: ``input_blocks.N.M``, ResBlock ``in_layers/emb_layers/out_layers``,
  SpatialTransformer ``transformer_blocks.D.attn{1,2}.to_{q,k,v,out}`` /
  ``ff.net.{0.proj,2}`` / ``norm{1,2,3}`` / ``proj_{in,out}``);
* ``first_stage_model.*``       — the taming VQ autoencoder
  (``encoder.down.L.block.I``, ``mid.block_1/attn_1/block_2``,
  ``decoder.up.L...``, ``quantize.embedding``, ``quant_conv``);
* ``cond_stage_model.transformer.*`` — the x-transformers BERTEmbedder
  (``token_emb``, ``pos_emb.emb``, ``attn_layers.layers.{2i}.1.to_q`` ...).

EMA: LatentDiffusion checkpoints trained with ``use_ema`` carry LitEma
shadow buffers (``model_ema.<param-path-with-dots-removed>``); the reference
samples inside ``model.ema_scope()`` (reference sample.py:395), i.e. with the
EMA weights swapped in — so conversion prefers them when present.

Each converter is round-trip tested against a torch oracle emitting the
exact reference key naming in tests/test_convert_ldm.py.
"""

from __future__ import annotations

import re
from typing import Mapping, Tuple

import numpy as np

from clip_diffusion_tpu.models.convert import _np, _set, conv_kernel, linear_kernel

UNET_PREFIX = "model.diffusion_model."
VQ_PREFIX = "first_stage_model."
BERT_PREFIX = "cond_stage_model.transformer."
EMA_PREFIX = "model_ema."


def split_ldm_state_dict(sd: Mapping[str, np.ndarray],
                         use_ema: bool = True) -> Tuple[dict, dict, dict]:
    """One LatentDiffusion state dict -> (unet_sd, vq_sd, bert_sd), with the
    UNet weights replaced by their LitEma shadows when present (that is what
    `ema_scope` samples with)."""
    unet, vq, bert = {}, {}, {}
    ema = {k[len(EMA_PREFIX):]: v for k, v in sd.items()
           if k.startswith(EMA_PREFIX)}
    for key, val in sd.items():
        if key.startswith(UNET_PREFIX):
            sub = key[len(UNET_PREFIX):]
            if use_ema and ema:
                # LitEma names shadow buffers by the wrapped module's
                # parameter path with the dots stripped
                squashed = ("diffusion_model." + sub).replace(".", "")
                val = ema.get(squashed, val)
            unet[sub] = val
        elif key.startswith(VQ_PREFIX):
            vq[key[len(VQ_PREFIX):]] = val
        elif key.startswith(BERT_PREFIX):
            bert[key[len(BERT_PREFIX):]] = val
        # everything else (betas/alphas tables, logvar, model_ema.decay,
        # cond_stage_model.tknz_fn buffers, loss nets) is derived or unused
    return unet, vq, bert


# --------------------------------------------------------------------------
# LDM UNet (openaimodel + SpatialTransformer naming)
# --------------------------------------------------------------------------

_RES_CONVS = {"in_layers.2": "in_layers_2", "out_layers.3": "out_layers_3",
              "skip_connection": "skip_connection", "op": "op", "conv": "conv"}
_RES_NORMS = {"in_layers.0": "in_layers_0", "out_layers.0": "out_layers_0"}


def _convert_spatial_transformer(params, block, rest, leaf, val, key):
    """SpatialTransformer sub-keys under one attention block."""
    if rest == "norm":
        _set(params, (block, "norm", "GroupNorm_0",
                      "scale" if leaf == "weight" else "bias"), _np(val))
    elif rest in ("proj_in", "proj_out"):
        _set(params, (block, rest, "kernel" if leaf == "weight" else "bias"),
             conv_kernel(val) if leaf == "weight" else _np(val))
    elif rest.startswith("transformer_blocks."):
        parts = rest.split(".")
        sub = (block, f"blocks_{parts[1]}")
        tail = parts[2:]
        if re.fullmatch(r"norm[123]", tail[0]):
            _set(params, sub + (tail[0],
                                "scale" if leaf == "weight" else "bias"),
                 _np(val))
        elif tail[0] in ("attn1", "attn2"):
            if tail[1] in ("to_q", "to_k", "to_v"):
                _set(params, sub + (tail[0], tail[1], "kernel"),
                     linear_kernel(val))
            elif tail[1] == "to_out":  # to_out.0 = Linear inside Sequential
                _set(params, sub + (tail[0], "to_out",
                                    "kernel" if leaf == "weight" else "bias"),
                     linear_kernel(val) if leaf == "weight" else _np(val))
            else:
                raise KeyError(f"unmapped attention key: {key}")
        elif tail[0] == "ff":
            # ff.net.0.proj = GEGLU projection; ff.net.2 = output Linear
            if tail[1] == "net" and tail[2] == "0" and tail[3] == "proj":
                _set(params, sub + ("ff_geglu", "proj",
                                    "kernel" if leaf == "weight" else "bias"),
                     linear_kernel(val) if leaf == "weight" else _np(val))
            elif tail[1] == "net" and tail[2] == "2":
                _set(params, sub + ("ff_out",
                                    "kernel" if leaf == "weight" else "bias"),
                     linear_kernel(val) if leaf == "weight" else _np(val))
            else:
                raise KeyError(f"unmapped ff key: {key}")
        else:
            raise KeyError(f"unmapped transformer_blocks key: {key}")
    else:
        raise KeyError(f"unmapped SpatialTransformer key: {key}")


def convert_ldm_unet(state_dict: Mapping[str, np.ndarray]) -> dict:
    """LDM UNet state dict (keys WITHOUT the model.diffusion_model. prefix)
    -> {'params': ...} for models.ldm.unet.LDMUNet."""
    params: dict = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "time_embed":
            _set(params, (f"time_embed_{parts[1]}",
                          "kernel" if leaf == "weight" else "bias"),
                 linear_kernel(val) if leaf == "weight" else _np(val))
            continue
        if parts[0] == "out":
            if parts[1] == "0":
                _set(params, ("out_0", "GroupNorm_0",
                              "scale" if leaf == "weight" else "bias"),
                     _np(val))
            else:
                _set(params, ("out_2", "kernel" if leaf == "weight" else "bias"),
                     conv_kernel(val) if leaf == "weight" else _np(val))
            continue
        if parts[0] == "middle_block":
            block = f"middle_block_{parts[1]}"
            rest = ".".join(parts[2:-1])
        else:  # input_blocks.N.M... / output_blocks.N.M...
            block = f"{parts[0]}_{parts[1]}_{parts[2]}"
            rest = ".".join(parts[3:-1])

        if rest == "":  # input_blocks.0.0 stem conv
            _set(params, (block, "kernel" if leaf == "weight" else "bias"),
                 conv_kernel(val) if leaf == "weight" else _np(val))
        elif rest in _RES_NORMS:
            _set(params, (block, _RES_NORMS[rest], "GroupNorm_0",
                          "scale" if leaf == "weight" else "bias"), _np(val))
        elif rest in _RES_CONVS:
            _set(params, (block, _RES_CONVS[rest],
                          "kernel" if leaf == "weight" else "bias"),
                 conv_kernel(val) if leaf == "weight" else _np(val))
        elif rest == "emb_layers.1":
            _set(params, (block, "emb_layers_1",
                          "kernel" if leaf == "weight" else "bias"),
                 linear_kernel(val) if leaf == "weight" else _np(val))
        else:
            _convert_spatial_transformer(params, block, rest, leaf, val, key)
    return {"params": params}


# --------------------------------------------------------------------------
# VQ-f8 first stage (taming naming)
# --------------------------------------------------------------------------

def _convert_ae_block(params, scope, rest, leaf, val, key):
    """Encoder/Decoder sub-keys -> the flat flax names of autoencoder.py."""
    parts = rest.split(".")
    kername = "kernel" if leaf == "weight" else "bias"

    def set_conv(path):
        _set(params, (scope,) + path + (kername,),
             conv_kernel(val) if leaf == "weight" else _np(val))

    def set_norm(path):
        _set(params, (scope,) + path + ("GroupNorm_0",
                                        "scale" if leaf == "weight" else "bias"),
             _np(val))

    def resblock(name, sub):
        if sub.startswith("norm"):
            set_norm((name, sub))
        else:  # conv1/conv2/nin_shortcut
            set_conv((name, sub))

    def attnblock(name, sub):
        if sub == "norm":
            set_norm((name, sub))
        else:  # q/k/v/proj_out 1x1 convs
            set_conv((name, sub))

    if parts[0] in ("conv_in", "conv_out"):
        set_conv((parts[0],))
    elif parts[0] == "norm_out":
        set_norm((parts[0],))
    elif parts[0] == "mid":
        name = f"mid_{parts[1]}"
        (attnblock if "attn" in parts[1] else resblock)(name, parts[2])
    elif parts[0] in ("down", "up"):
        level = parts[1]
        if parts[2] == "block":
            resblock(f"{parts[0]}_{level}_block_{parts[3]}", parts[4])
        elif parts[2] == "attn":
            attnblock(f"{parts[0]}_{level}_attn_{parts[3]}", parts[4])
        elif parts[2] in ("downsample", "upsample"):  # .conv.weight
            set_conv((f"{parts[0]}_{level}_{parts[2]}",))
        else:
            raise KeyError(f"unmapped autoencoder key: {key}")
    else:
        raise KeyError(f"unmapped autoencoder key: {key}")


def convert_vq(state_dict: Mapping[str, np.ndarray]) -> dict:
    """taming VQModel state dict (keys WITHOUT the first_stage_model.
    prefix) -> {'params': ...} for models.ldm.autoencoder.VQModel."""
    params: dict = {}
    for key, val in state_dict.items():
        if key.startswith("loss."):  # training-only discriminator/lpips
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] in ("encoder", "decoder"):
            _convert_ae_block(params, parts[0], ".".join(parts[1:-1]),
                              leaf, val, key)
        elif parts[0] in ("quant_conv", "post_quant_conv"):
            _set(params, (parts[0], "kernel" if leaf == "weight" else "bias"),
                 conv_kernel(val) if leaf == "weight" else _np(val))
        elif key == "quantize.embedding.weight":
            _set(params, ("codebook",), _np(val))
        else:
            raise KeyError(f"unmapped VQ key: {key}")
    return {"params": params}


# --------------------------------------------------------------------------
# BERTEmbedder (x-transformers TransformerWrapper naming)
# --------------------------------------------------------------------------

def convert_bert(state_dict: Mapping[str, np.ndarray]) -> dict:
    """x-transformers TransformerWrapper state dict (keys WITHOUT the
    cond_stage_model.transformer. prefix) -> {'params': ...} for
    models.ldm.bert.BERTEmbedder.

    Layer layout: ``attn_layers.layers.{i}`` is ModuleList([LayerNorm,
    block]) with even i = Attention (separate to_q/to_k/to_v, fused here
    into one qkv kernel), odd i = FeedForward (net.0.0 / net.2 Linears).
    ``to_logits`` (the LM head) is unused by get_learned_conditioning and
    skipped."""
    params: dict = {}
    # gather attention q/k/v per layer to fuse after the scan
    qkv_parts: dict = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        if key == "token_emb.weight":
            _set(params, ("token_emb", "embedding"), _np(val))
        elif key == "pos_emb.emb.weight":
            _set(params, ("pos_emb",), _np(val))
        elif parts[0] in ("norm",) or (parts[0] == "attn_layers"
                                       and parts[1] == "norm"):
            _set(params, ("norm", "scale" if leaf == "weight" else "bias"),
                 _np(val))
        elif parts[0] == "to_logits" or parts[0] == "project_emb":
            continue  # LM head / identity projection: unused
        elif parts[0] == "attn_layers" and parts[1] == "layers":
            i = int(parts[2])
            pair, kind = divmod(i, 2)
            block = f"layers_{pair}"
            if parts[3] == "0":  # pre-norm LayerNorm
                norm = "norm1" if kind == 0 else "norm2"
                _set(params, (block, norm,
                              "scale" if leaf == "weight" else "bias"),
                     _np(val))
            elif kind == 0:  # Attention
                sub = parts[4]
                if sub in ("to_q", "to_k", "to_v"):
                    qkv_parts.setdefault(block, {})[sub] = linear_kernel(val)
                elif sub == "to_out":
                    _set(params, (block, "attn_out",
                                  "kernel" if leaf == "weight" else "bias"),
                         linear_kernel(val) if leaf == "weight" else _np(val))
                else:
                    raise KeyError(f"unmapped bert attention key: {key}")
            else:  # FeedForward: net.0.0 (Linear) / net.2 (Linear)
                if parts[4] == "net" and parts[5] == "0" and parts[6] == "0":
                    _set(params, (block, "ff_in",
                                  "kernel" if leaf == "weight" else "bias"),
                         linear_kernel(val) if leaf == "weight" else _np(val))
                elif parts[4] == "net" and parts[5] == "2":
                    _set(params, (block, "ff_out",
                                  "kernel" if leaf == "weight" else "bias"),
                         linear_kernel(val) if leaf == "weight" else _np(val))
                else:
                    raise KeyError(f"unmapped bert ff key: {key}")
        else:
            raise KeyError(f"unmapped bert key: {key}")
    for block, parts3 in qkv_parts.items():
        missing = {"to_q", "to_k", "to_v"} - set(parts3)
        if missing:
            raise KeyError(f"{block} missing attention kernels: {missing}")
        _set(params, (block, "qkv", "kernel"),
             np.concatenate([parts3["to_q"], parts3["to_k"], parts3["to_v"]],
                            axis=1))
    return {"params": params}


def convert_ldm_checkpoint(sd: Mapping[str, np.ndarray],
                           use_ema: bool = True) -> dict:
    """Full LatentDiffusion state dict -> {"unet":..., "vq":..., "bert":...}
    flax trees (the three orbax artifacts zoo.build_latent_models loads)."""
    unet_sd, vq_sd, bert_sd = split_ldm_state_dict(sd, use_ema=use_ema)
    if not unet_sd or not vq_sd or not bert_sd:
        raise ValueError(
            "state dict does not look like a LatentDiffusion checkpoint "
            f"(unet={len(unet_sd)} vq={len(vq_sd)} bert={len(bert_sd)} keys)"
        )
    return {
        "unet": convert_ldm_unet(unet_sd),
        "vq": convert_vq(vq_sd),
        "bert": convert_bert(bert_sd),
    }
