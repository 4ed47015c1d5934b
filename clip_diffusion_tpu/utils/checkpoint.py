"""Checkpointing: model params + sampling-state resume.

The reference's only checkpointing is model-file download-with-cache
(reference models.py:41-64) and the skip_timesteps+init_image trajectory
restart (reference sample.py:70-71,257-258; SURVEY.md §5).  Here:

* model parameter trees persist via orbax (save_params/load_params);
* true mid-trajectory resume: `SamplingState` captures (x_t, step, key,
  eps history) so a preempted pod job continues bit-exactly — the per-step
  RNG is fold_in(key, step), independent of how many steps already ran.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save_params(path: str, params) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))


def load_validated_params(path: str, template_tree, param_dtype, what: str):
    """The one validated-load sequence every loader shares: orbax restore →
    structure+shape check against the model's init template → cast float
    leaves to `param_dtype` → ONE device_put.  Raises RuntimeError when the
    tree doesn't match — a provisioned deployment must never silently serve
    random weights because a checkpoint was corrupted.  Used by both
    zoo.load_or_init and the serving registry (runtime/registry.py) so the
    strict-load policy cannot drift between them."""
    from clip_diffusion_tpu.models.convert import validate_against

    loaded = load_params(path)
    problems = validate_against(template_tree, loaded)
    if problems:
        raise RuntimeError(
            f"checkpoint {path} does not match the {what} template: "
            f"{problems[:3]}..."
        )
    tree = jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(param_dtype)
        if np.issubdtype(np.asarray(x).dtype, np.floating)
        else np.asarray(x),
        loaded,
    )
    return jax.device_put(tree)


def key_data(key) -> np.ndarray:
    """Raw uint32 words of a PRNG key — works for both typed key arrays
    (jax.random.key) and legacy raw uint32 keys (jax.random.PRNGKey)."""
    try:
        return np.asarray(jax.random.key_data(key))
    except (TypeError, ValueError):
        return np.asarray(key, np.uint32)


@dataclasses.dataclass
class SamplingState:
    """Mid-trajectory sampler state for preemption-safe resume.

    `key_data` holds the raw uint32 words of the trajectory's base PRNG key
    (the `key` the original guided_sample call received), so a resume in a
    NEW process needs nothing but this file + the params: guided_sample
    reconstructs the key when the caller passes key=None, and refuses a
    mismatching explicit key rather than silently diverging (the per-step
    RNG is fold_in of this key — a wrong key resumes a different
    trajectory)."""

    x: Any  # (B,H,W,C) current x_t
    step: int  # next respaced step index to execute (counts down)
    eps_history: Any  # (3,B,H,W,C) PLMS ring
    history_count: int
    key_data: Any  # raw uint32 words of the trajectory's base PRNG key

    def save(self, path: str) -> None:
        np.savez(
            path,
            x=np.asarray(self.x),
            step=self.step,
            eps_history=np.asarray(self.eps_history),
            history_count=self.history_count,
            key_data=np.asarray(self.key_data, np.uint32),
        )

    @staticmethod
    def load(path: str) -> "SamplingState":
        z = np.load(path)
        return SamplingState(
            x=jnp.asarray(z["x"]),
            step=int(z["step"]),
            eps_history=jnp.asarray(z["eps_history"]),
            history_count=int(z["history_count"]),
            key_data=np.asarray(z["key_data"], np.uint32),
        )
