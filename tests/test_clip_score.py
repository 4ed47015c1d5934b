"""CLIP-score harness (guidance/score.py): the fixed-prompt parity metric.

The real capability check: guidance must MOVE the image toward the prompt
under the same metric it descends (squared spherical distance, reference
losses.py:10-16) — true even with test-double towers, because the score
and the guidance share the embedding geometry.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.guidance.score import (
    PROMPT_SUITE,
    clip_scores,
    score_suite,
)
from clip_diffusion_tpu.models.clip import tiny_clip_config
from clip_diffusion_tpu.models.clip.model import CLIPModel
from clip_diffusion_tpu.tests_support import build_tiny_pipeline


def _tiny_clips(params):
    cfg = tiny_clip_config(name="tiny0")
    return {"tiny0": (CLIPModel(cfg), params["perceptors"][0]["clip"])}


def test_clip_scores_shape_and_range():
    pipe, params, _ = build_tiny_pipeline(steps=3)
    img01 = jax.random.uniform(jax.random.PRNGKey(0), (48, 64, 3))
    s = clip_scores(_tiny_clips(params), img01, "a test prompt")
    assert set(s) == {"cosine", "spherical"}
    assert -1.0 <= s["cosine"]["tiny0"] <= 1.0
    assert 0.0 <= s["spherical"]["tiny0"] <= (2 * np.arcsin(1.0)) ** 2 + 1e-6
    assert s["cosine"]["mean"] == s["cosine"]["tiny0"]
    # non-square input goes through resize+center-crop, not distortion:
    # same image transposed scores differently in general but is finite
    assert np.isfinite(s["cosine"]["tiny0"])


def test_guided_improves_clip_score_vs_unguided():
    """Same seed, same UNet: the guided trajectory's final image must score
    closer to the prompt than the unguided one (the metric the cond_fn
    descends, evaluated on the full image)."""
    from clip_diffusion_tpu.pipeline.guided import guided_sample

    pipe, params, _ = build_tiny_pipeline(steps=10)
    off = dataclasses.replace(
        pipe,
        config=pipe.config.replace(
            clip_guidance_scale=0.0, denoise_scale=0.0, range_scale=0.0
        ),
    )
    key = jax.random.PRNGKey(3)
    guided, _ = guided_sample(pipe, params, key, batch_size=2)
    unguided, _ = guided_sample(off, params, key, batch_size=2)
    clips = _tiny_clips(params)

    def mean_spherical(batch):
        img01 = jnp.clip((batch + 1.0) / 2.0, 0.0, 1.0)
        return np.mean([
            clip_scores(clips, img01[i], "a test prompt")["spherical"]["mean"]
            for i in range(img01.shape[0])
        ])

    sg, su = mean_spherical(guided), mean_spherical(unguided)
    assert sg < su, f"guided {sg} not closer to prompt than unguided {su}"


def test_score_suite_runs_fixed_prompts():
    pipe, params, _ = build_tiny_pipeline(steps=3)
    clips = _tiny_clips(params)
    calls = []

    def fake_sample(prompt):
        calls.append(prompt)
        k = jax.random.PRNGKey(len(calls))
        return jax.random.uniform(k, (32, 32, 3))

    rows, mean = score_suite(clips, fake_sample, PROMPT_SUITE[:3])
    assert calls == list(PROMPT_SUITE[:3])
    assert len(rows) == 3 and np.isfinite(mean)
