"""Run configuration and dense per-timestep schedules.

The reference keeps a mutable class-attribute singleton (`Config` in
reference config.py:17-80) whose cutout schedules are dense 1000-entry Python
tuples indexed by `current_diffusion_step = 1000 - (t+1)` (reference
sample.py:156-171).  On TPU the equivalent is an *immutable* dataclass whose
hashable scalar knobs become jit static arguments and whose schedules are
`jnp.ndarray[1000]` tables gathered by timestep *inside* the compiled loop —
they are data, not control flow, so changing phase never retraces.

Knob names and default values mirror the reference so that a user of the
reference finds the same dials (reference config.py:17-52).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

# Length of the schedule basis.  The reference builds all cutout schedules on
# a 1000-step basis regardless of the respaced sampler step count (reference
# config.py:29-38, sample.py:156-159).
SCHEDULE_BASIS = 1000


def create_schedule(values: Tuple, steps: Tuple) -> Tuple:
    """Piecewise-constant schedule: values[i] repeated steps[i] times.

    Mirrors reference config.py:4-14 (same name, same semantics) so existing
    schedule definitions carry over verbatim.
    """
    if len(values) != len(steps):
        raise ValueError("length of values and steps must be the same")
    schedule: Tuple = ()
    for value, num_steps in zip(values, steps):
        schedule += (value,) * num_steps
    return schedule


def schedule_array(schedule: Tuple, dtype=np.float32) -> np.ndarray:
    """Dense schedule tuple -> numpy table for on-device gathering."""
    arr = np.asarray(schedule, dtype=dtype)
    if arr.shape[0] != SCHEDULE_BASIS:
        raise ValueError(
            f"schedule must have {SCHEDULE_BASIS} entries, got {arr.shape[0]}"
        )
    return arr


@dataclasses.dataclass(frozen=True)
class CutoutSchedules:
    """The four Disco-style cutout schedules as dense tables.

    Defaults replicate reference config.py:29-38.
    """

    num_overview_cuts: Tuple = create_schedule((14, 12, 4, 0), (200, 200, 400, 200))
    num_inner_cuts: Tuple = create_schedule((2, 4, 2, 12), (200, 200, 400, 200))
    inner_cut_size_power: Tuple = create_schedule((5,), (1000,))
    cut_gray_portion: Tuple = create_schedule(
        (0.7, 0.6, 0.45, 0.3, 0), (100, 100, 100, 100, 600)
    )

    def as_arrays(self):
        """Return (overview[i32], inner[i32], power[f32], gray[f32]) tables."""
        return (
            schedule_array(self.num_overview_cuts, np.int32),
            schedule_array(self.num_inner_cuts, np.int32),
            schedule_array(self.inner_cut_size_power, np.float32),
            schedule_array(self.cut_gray_portion, np.float32),
        )

    @property
    def max_overview_cuts(self) -> int:
        return int(max(self.num_overview_cuts))

    @property
    def max_inner_cuts(self) -> int:
        return int(max(self.num_inner_cuts))


@dataclasses.dataclass(frozen=True)
class Config:
    """Immutable generation configuration.

    Knobs and defaults mirror the reference mutable singleton (reference
    config.py:17-52); `replace()` is the functional analog of the
    `Config.update` RPC mutation (reference config.py:54-80), including the
    force-to-multiple-of-64 canvas rule (reference config.py:70-71).
    """

    # Canvas (forced to multiples of 64; reference config.py:24-25,70-71).
    width: int = 768
    height: int = 512

    # Cutouts (reference config.py:28).
    num_cutout_batches: int = 4
    cutout_schedules: CutoutSchedules = dataclasses.field(
        default_factory=CutoutSchedules
    )

    # Model choices (reference config.py:41-42).
    chosen_clip_models: Tuple[str, ...] = ("ViT-B/32", "ViT-B/16", "ViT-L/14", "RN101")
    chosen_predictors: Tuple[str, ...] = ("ViT-B/32", "ViT-B/16", "ViT-L/14")

    # Guidance gradient clamp (reference config.py:45).
    grad_threshold: float = 0.05

    # Cutout sharing: the reference draws a fresh random cutout batch per
    # CLIP model (reference sample.py:161-172); since the batches are i.i.d.
    # augmentations, same-resolution perceptors can score ONE shared batch —
    # identical loss distribution, 1/N the cutout compute.  Set False for
    # strict reference parity.
    share_cutouts_across_perceptors: bool = True

    # dtype for the cutout/augment/CLIP-input path ("bfloat16" rides the
    # MXU at 2x; "float32" keeps bitwise placement-invariance for tests)
    guidance_dtype: str = "bfloat16"

    # Max cut-images per CLIP tower pass inside the guidance grad; larger
    # batches are split into sequential chunks (embeddings concatenated —
    # per-cut math is identical, only XLA's schedule changes).  Measured
    # round 5 on v5e: the fwd+bwd tower pass is SUPERLINEAR in batch
    # (L/14: 3.40/3.79/3.99 ms/cut at 24/48/64 cuts — backward-residual
    # working set), and chunking recovers it: L/14 64-cut 255.5 -> 198.4
    # ms at chunk 16 (-22%), B/16 57->39.  0 disables chunking.
    clip_cut_chunk: int = 16

    # Loss scales (reference config.py:47-52).
    clip_guidance_scale: float = 8000.0
    denoise_scale: float = 10000.0  # total-variation loss weight
    range_scale: float = 0.0  # rgb_range_loss (reference losses.py:31-35; dead there, live here)
    LPIPS_scale: float = 1000.0
    aesthetic_scale: float = 0.0
    MS_SSIM_scale: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "width", max((self.width // 64) * 64, 64))
        object.__setattr__(self, "height", max((self.height // 64) * 64, 64))

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)
