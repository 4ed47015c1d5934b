import numpy as np
import pytest

from clip_diffusion_tpu.diffusion.schedule import (
    base_diffusion_steps,
    linear_betas,
    make_schedule,
    space_timesteps,
)
from clip_diffusion_tpu.config import Config, CutoutSchedules, create_schedule


def test_linear_betas_match_1000_step_reference():
    betas = linear_betas(1000)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    assert len(betas) == 1000


def test_linear_betas_scale_with_base():
    # A 500-step base must cover the same total noise: scale = 2.
    betas = linear_betas(500)
    assert betas[0] == pytest.approx(2e-4)
    assert betas[-1] == pytest.approx(0.04)


def test_base_diffusion_steps_rounding():
    # reference models.py:100-102
    assert base_diffusion_steps(200) == 1000
    assert base_diffusion_steps(250) == 1000
    assert base_diffusion_steps(50) == 1000
    assert base_diffusion_steps(300) == 900
    assert base_diffusion_steps(1000) == 1000
    assert base_diffusion_steps(1500) == 1500


def test_space_timesteps_ddim_rule():
    ts = space_timesteps(1000, 250)
    assert len(ts) == 250
    assert sorted(ts) == list(range(0, 1000, 4))


def test_respaced_marginals_match_base():
    """Respacing must preserve alpha_bar at the kept timesteps exactly."""
    sched = make_schedule(steps=50)
    base_betas = linear_betas(sched.base_steps)
    base_acp = np.cumprod(1.0 - base_betas)
    np.testing.assert_allclose(
        sched.alphas_cumprod, base_acp[sched.timestep_map], rtol=1e-12
    )


def test_posterior_identities():
    sched = make_schedule(steps=25)
    # posterior mean coefficients must sum appropriately: for x0 = x_t case
    # mean coefs: coef1 + coef2 * sqrt(acp)/... sanity: coef1*1 + coef2*1 at
    # t where acp ~ acp_prev ~ 1 should be ~1.
    assert sched.posterior_variance.shape == (25,)
    assert np.all(sched.posterior_variance >= 0)
    assert np.all(np.isfinite(sched.posterior_log_variance_clipped))
    # q(x_{t-1}|x_t, x0=pred) mean coefficients satisfy
    # coef1 = beta * sqrt(acp_prev) / (1-acp), coef2 = (1-acp_prev)sqrt(a)/(1-acp)
    lhs = sched.posterior_mean_coef1 * np.sqrt(sched.alphas_cumprod) + (
        sched.posterior_mean_coef2 * sched.alphas_cumprod_prev * 0
    )
    assert np.all(np.isfinite(lhs))


def test_rescaled_timesteps_range():
    sched = make_schedule(steps=200)
    assert sched.scaled_timesteps.min() >= 0
    assert sched.scaled_timesteps.max() < 1000
    # stride 5 over 1000 base -> scaled == original since base == 1000
    np.testing.assert_allclose(sched.scaled_timesteps, sched.timestep_map)


def test_create_schedule_matches_reference_semantics():
    s = create_schedule(values=(14, 12, 4, 0), steps=(200, 200, 400, 200))
    assert len(s) == 1000
    assert s[0] == 14 and s[199] == 14
    assert s[200] == 12 and s[399] == 12
    assert s[400] == 4 and s[799] == 4
    assert s[800] == 0 and s[999] == 0


def test_cutout_schedule_arrays():
    cs = CutoutSchedules()
    ov, inn, power, gray = cs.as_arrays()
    assert ov.shape == (1000,) and ov.dtype == np.int32
    assert inn.dtype == np.int32
    assert power.dtype == np.float32 and gray.dtype == np.float32
    assert cs.max_overview_cuts == 14
    assert cs.max_inner_cuts == 12


def test_config_canvas_forced_to_64():
    cfg = Config(width=770, height=513)
    assert cfg.width == 768
    assert cfg.height == 512
    cfg2 = cfg.replace(clip_guidance_scale=5000)
    assert cfg2.clip_guidance_scale == 5000
    assert cfg2.width == 768
