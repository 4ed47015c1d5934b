"""Per-request UNet checkpoint registry for the serving surface.

The reference lets a client pick a model type per request — the notebook
maps the UI names {通用 (general), 景觀 (landscape), 建築 (building)} to
finetuned UNet checkpoint paths and threads the choice through
`custom_model_path` into the sampler (reference
clip_diffusion_main_server.ipynb cells 14-16, sample.py:64,97-99).  The
in-process analog here is `guided_diffusion_sample(custom_model_params=...)`
(sample.py), but a params pytree cannot cross the HTTP boundary — this
registry is the name -> checkpoint mapping that makes the capability
reachable from a client:

* `register(name, path)` binds a model-type name to a converted orbax
  checkpoint directory (tools/fetch_and_convert.py output layout);
* `discover()` scans the checkpoint root for `guided_unet_custom_<name>`
  directories and auto-registers them, plus the reference UI aliases;
* `load(name)` loads-and-caches the params on first request (the reference
  reloads the full UNet from disk on EVERY request, sample.py:97-99;
  here each finetune is read once and stays device-resident).

The default name 通用 (and "general"/"default") maps to `None`, meaning
"use the zoo's default UNet params".
"""

from __future__ import annotations

import os
import threading
from typing import Dict, Optional

import jax
import jax.numpy as jnp

# reference UI name -> checkpoint slug (notebook cell 14: model_type ->
# {None, landscape, building} checkpoint path)
REFERENCE_ALIASES = {
    "通用": None,
    "general": None,
    "default": None,
    "景觀": "landscape",
    "landscape": "landscape",
    "建築": "building",
    "building": "building",
}

CUSTOM_PREFIX = "guided_unet_custom_"


class UnknownModelType(KeyError):
    """A model_type name with no registry entry — a CLIENT error (400),
    distinct from KeyErrors raised while reading a registered checkpoint
    (a SERVER error the HTTP layer must answer 500 for)."""


class UNetRegistry:
    """Thread-safe name -> finetuned-UNet-params registry with first-use
    load caching."""

    def __init__(self, entries: Optional[Dict[str, str]] = None,
                 image_size: int = 512, param_dtype=jnp.bfloat16,
                 unet_config=None):
        from clip_diffusion_tpu.models.unet import UNetConfig, UNetModel

        self._paths: Dict[str, str] = dict(entries or {})
        self._cache: Dict[str, object] = {}
        self._lock = threading.Lock()
        self._param_dtype = param_dtype
        cfg = unet_config or UNetConfig.for_image_size(image_size)
        self._template_model = UNetModel(cfg)

    # -- registration ------------------------------------------------------
    def register(self, name: str, checkpoint_path: str) -> None:
        """Bind `name` to a converted orbax checkpoint directory."""
        if not os.path.isdir(checkpoint_path):
            raise FileNotFoundError(
                f"model registry: {checkpoint_path!r} is not a directory"
            )
        with self._lock:
            self._paths[name] = checkpoint_path
            self._cache.pop(checkpoint_path, None)

    def discover(self, root: Optional[str] = None) -> "UNetRegistry":
        """Scan `<root>` for `guided_unet_custom_<slug>` checkpoint dirs and
        register each under its slug; also wire the reference UI aliases
        (通用/景觀/建築) to the matching slugs when present."""
        from clip_diffusion_tpu.zoo import DEFAULT_FLAX_ROOT, FLAX_ROOT_ENV

        root = root or os.environ.get(FLAX_ROOT_ENV, DEFAULT_FLAX_ROOT)
        if os.path.isdir(root):
            for entry in sorted(os.listdir(root)):
                full = os.path.join(root, entry)
                if entry.startswith(CUSTOM_PREFIX) and os.path.isdir(full):
                    self._paths.setdefault(entry[len(CUSTOM_PREFIX):], full)
        for alias, slug in REFERENCE_ALIASES.items():
            if slug is not None and slug in self._paths:
                self._paths.setdefault(alias, self._paths[slug])
        return self

    def names(self):
        """Registered model-type names (the defaults are always valid)."""
        return sorted(
            set(self._paths)
            | {a for a, s in REFERENCE_ALIASES.items() if s is None}
        )

    # -- loading -----------------------------------------------------------
    def load(self, name: Optional[str]):
        """Params for `name`, cached after the first load.  Returns None for
        the default model type (caller keeps the zoo UNet).  Raises KeyError
        for unregistered names."""
        if name is None:
            return None
        if name in REFERENCE_ALIASES and REFERENCE_ALIASES[name] is None:
            return None
        with self._lock:
            if name not in self._paths:
                raise UnknownModelType(
                    f"unknown model_type {name!r}; registered: {self.names()}"
                )
            path = self._paths[name]
            # cache keyed by path: aliases (景觀 == landscape) share one
            # device-resident tree.  The load happens UNDER the lock:
            # concurrent first requests for the same finetune must not each
            # device_put a full 552M tree (HBM headroom at 512² is tight
            # enough that a transient duplicate can kill the TPU worker —
            # see STATUS.md batch-scaling notes); blocking the second
            # request for the load duration is the cheap safe choice.
            if path not in self._cache:
                self._cache[path] = self._load_checkpoint(path)
            return self._cache[path]

    def _load_checkpoint(self, path: str):
        # the shared validated-load gate (utils/checkpoint.py) — the UNet
        # param tree is geometry-independent, so a small template suffices
        from clip_diffusion_tpu.utils.checkpoint import load_validated_params

        template = jax.eval_shape(
            lambda: self._template_model.init(
                jax.random.PRNGKey(0),
                jnp.ones((1, 64, 64, 3)),
                jnp.zeros((1,)),
            )
        )
        return load_validated_params(
            path, template, self._param_dtype, "finetuned UNet"
        )
