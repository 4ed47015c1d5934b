import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.config import Config, CutoutSchedules, create_schedule
from clip_diffusion_tpu.diffusion.sampling import SamplerConfig
from clip_diffusion_tpu.pipeline.guided import (
    GuidedPipeline,
    compute_phase_segments,
    guided_sample,
)
from clip_diffusion_tpu.tests_support import build_tiny_pipeline, tiny_config


def _phase_pipeline(segmented: bool):
    """Tiny pipeline whose cutout schedule has two phases."""
    pipe, params, _ = build_tiny_pipeline(steps=10)
    cfg = tiny_config(
        cutout_schedules=CutoutSchedules(
            num_overview_cuts=create_schedule((4, 1), (500, 500)),
            num_inner_cuts=create_schedule((1, 3), (500, 500)),
            inner_cut_size_power=create_schedule((5,), (1000,)),
            cut_gray_portion=create_schedule((0.5,), (1000,)),
        )
    )
    pipe = dataclasses.replace(
        pipe,
        config=cfg,
        sampler=SamplerConfig(mode="ddim", steps=10, eta=0.8,
                              phase_segmented=segmented),
    )
    return pipe, params


def test_compute_phase_segments():
    pipe, _ = _phase_pipeline(False)
    segs = compute_phase_segments(pipe, 10)
    assert len(segs) == 2
    # early steps (high timesteps -> low schedule index) use phase 1 counts
    steps0, caps0 = segs[0]
    steps1, caps1 = segs[1]
    assert caps0 == (4, 1)
    assert caps1 == (1, 3)
    assert len(steps0) + len(steps1) == 10
    # execution order is descending steps
    assert steps0[0] == 9 and steps1[-1] == 0


def test_segmented_matches_active_cut_semantics():
    """Segmented and padded runners must produce finite, comparable
    trajectories (identical seeds; cutout RNG consumption differs by
    construction, so exact equality is not expected — but statistics and
    convergence must agree)."""
    key = jax.random.PRNGKey(0)
    pipe_p, params = _phase_pipeline(False)
    pipe_s, _ = _phase_pipeline(True)
    f_pad, _ = guided_sample(pipe_p, params, key, batch_size=1)
    f_seg, _ = guided_sample(pipe_s, params, key, batch_size=1)
    assert np.isfinite(np.asarray(f_seg)).all()
    assert f_seg.shape == f_pad.shape
    # same data range
    assert abs(float(f_seg.mean()) - float(f_pad.mean())) < 0.5


def test_segment_caps_cover_schedule():
    pipe, _ = _phase_pipeline(False)
    segs = compute_phase_segments(pipe, 10)
    for steps, (ov, inn) in segs:
        assert 0 <= ov <= 4 and 0 <= inn <= 3
