import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.diffusion.sampling import (
    MAX_PLMS_ORDER,
    condition_eps,
    ddim_step,
    dynamic_threshold,
    init_history,
    learned_log_variance,
    plms_eps,
    plms_step,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    push_history,
    q_sample,
    schedule_tables,
)
from clip_diffusion_tpu.diffusion.schedule import make_schedule


@pytest.fixture(scope="module")
def tables():
    return schedule_tables(make_schedule(steps=50), dtype=jnp.float64)


def test_xstart_eps_roundtrip(tables):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 3), dtype=jnp.float64)
    eps = jax.random.normal(jax.random.fold_in(key, 1), x.shape, dtype=x.dtype)
    for step in [0, 10, 49]:
        x0 = predict_xstart_from_eps(x, eps, tables, jnp.int32(step))
        eps2 = predict_eps_from_xstart(x, x0, tables, jnp.int32(step))
        np.testing.assert_allclose(np.asarray(eps2), np.asarray(eps), atol=1e-8)


def test_q_sample_marginals(tables):
    """E[q_sample] and Var[q_sample] must match sqrt(acp)*x0, 1-acp."""
    x0 = jnp.ones((1, 4, 4, 3), dtype=jnp.float64)
    step = jnp.int32(30)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    noises = jax.vmap(lambda k: jax.random.normal(k, x0.shape, x0.dtype))(keys)
    samples = jax.vmap(lambda n: q_sample(x0, tables, step, n))(noises)
    acp = float(tables["alphas_cumprod"][30])
    assert float(samples.mean()) == pytest.approx(np.sqrt(acp), abs=0.01)
    assert float(samples.var()) == pytest.approx(1 - acp, abs=0.02)


def test_ddim_step_deterministic_recurrence(tables):
    """eta=0 DDIM: x_{t-1} = sqrt(acp_prev) x0 + sqrt(1-acp_prev) eps for a
    consistent (x0, eps) pair — the DDIM paper update."""
    key = jax.random.PRNGKey(1)
    x0 = jax.random.uniform(key, (1, 8, 8, 3), jnp.float64, -1, 1)
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape, x0.dtype)
    step = jnp.int32(20)
    x_t = q_sample(x0, tables, step, eps)
    x_prev = ddim_step(x_t, eps, x0, tables, step, eta=0.0, noise=jnp.zeros_like(x_t))
    acp_prev = float(tables["alphas_cumprod_prev"][20])
    expected = np.sqrt(acp_prev) * np.asarray(x0) + np.sqrt(1 - acp_prev) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x_prev), expected, atol=1e-10)


def test_ddim_noise_suppressed_at_final_step(tables):
    x = jnp.ones((1, 4, 4, 3), dtype=jnp.float64)
    eps = jnp.zeros_like(x)
    noise = 100.0 * jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    # at step 0 the noise term must vanish exactly
    out0_noisy = ddim_step(x, eps, x, tables, jnp.int32(0), eta=1.0, noise=noise)
    out0_clean = ddim_step(x, eps, x, tables, jnp.int32(0), eta=1.0, noise=zeros)
    np.testing.assert_allclose(np.asarray(out0_noisy), np.asarray(out0_clean))
    # at a later step it must not
    out30_noisy = ddim_step(x, eps, x, tables, jnp.int32(30), eta=1.0, noise=noise)
    out30_clean = ddim_step(x, eps, x, tables, jnp.int32(30), eta=1.0, noise=zeros)
    assert float(jnp.abs(out30_noisy - out30_clean).max()) > 1.0


def test_ddim_eta1_matches_posterior_sigma(tables):
    """eta=1 sigma^2 == DDPM posterior variance (respaced betas identity)."""
    acp = np.asarray(tables["alphas_cumprod"])
    acp_prev = np.asarray(tables["alphas_cumprod_prev"])
    betas = np.asarray(tables["betas"])
    sigma2 = (1 - acp_prev) / (1 - acp) * (1 - acp / acp_prev)
    posterior = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(sigma2[1:], posterior[1:], rtol=1e-10)


def test_condition_eps_shift(tables):
    eps = jnp.zeros((1, 4, 4, 3), dtype=jnp.float64)
    grad = jnp.ones_like(eps)
    step = jnp.int32(10)
    out = condition_eps(eps, grad, tables, step)
    c = float(tables["sqrt_one_minus_alphas_cumprod"][10])
    np.testing.assert_allclose(np.asarray(out), -c, rtol=1e-12)


def test_dynamic_threshold_semantics():
    # image with a huge outlier: thresholded to quantile then rescaled
    x = jnp.concatenate(
        [jnp.full((1, 1000), 0.5), jnp.full((1, 8), 50.0)], axis=-1
    ).reshape(1, 12, 84, 1)
    out = dynamic_threshold(x, 0.9)
    assert float(jnp.max(out)) <= 1.0
    assert float(jnp.min(out)) >= -1.0
    # small image within [-1,1]: threshold floors at 1 -> unchanged
    y = jnp.full((1, 4, 4, 3), 0.3)
    np.testing.assert_allclose(np.asarray(dynamic_threshold(y, 0.995)), 0.3, rtol=1e-6)


def test_plms_eps_coefficients():
    shape = (1, 2, 2, 3)
    e = jnp.ones(shape)
    hist = init_history(shape)
    hist = hist.at[0].set(2.0)  # e_{t-1} = 2
    hist = hist.at[1].set(3.0)  # e_{t-2} = 3
    # order=1 -> always e_t
    np.testing.assert_allclose(np.asarray(plms_eps(e, hist, jnp.int32(2), 1)), 1.0)
    # order=2 with >=1 history -> (3*1 - 2)/2 = 0.5
    np.testing.assert_allclose(
        np.asarray(plms_eps(e, hist, jnp.int32(1), 2)), 0.5, rtol=1e-6
    )
    # order=3 with 2 history -> (23*1 - 16*2 + 5*3)/12 = 0.5
    np.testing.assert_allclose(
        np.asarray(plms_eps(e, hist, jnp.int32(2), 3)), 0.5, rtol=1e-6
    )
    # no history yet -> e_t regardless of order
    np.testing.assert_allclose(
        np.asarray(plms_eps(e, hist, jnp.int32(0), 4)), 1.0, rtol=1e-6
    )


def test_push_history():
    shape = (1, 2, 2, 1)
    hist = init_history(shape)
    hist = push_history(jnp.full(shape, 1.0), hist)
    hist = push_history(jnp.full(shape, 2.0), hist)
    assert float(hist[0].mean()) == 2.0
    assert float(hist[1].mean()) == 1.0
    assert hist.shape[0] == MAX_PLMS_ORDER - 1


def test_plms_step_transfer(tables):
    """PLMS transfer with exact eps reproduces the eta=0 DDIM update."""
    key = jax.random.PRNGKey(2)
    x0 = jax.random.uniform(key, (1, 8, 8, 3), jnp.float64, -1, 1)
    eps = jax.random.normal(jax.random.fold_in(key, 3), x0.shape, x0.dtype)
    step = jnp.int32(25)
    x_t = q_sample(x0, tables, step, eps)
    via_plms = plms_step(x_t, eps, tables, step)
    via_ddim = ddim_step(x_t, eps, x0, tables, step, 0.0, jnp.zeros_like(x_t))
    np.testing.assert_allclose(np.asarray(via_plms), np.asarray(via_ddim), atol=1e-9)


def test_learned_log_variance_bounds(tables):
    v = jnp.zeros((1, 4, 4, 3), dtype=jnp.float64)
    step = jnp.int32(30)
    out = learned_log_variance(v, tables, step)
    lo = float(tables["posterior_log_variance_clipped"][30])
    hi = float(jnp.log(tables["betas"][30]))
    mid = float(out.mean())
    assert lo <= mid <= hi
    # extremes hit the bounds
    out_lo = learned_log_variance(v - 1.0, tables, step)
    out_hi = learned_log_variance(v + 1.0, tables, step)
    assert float(out_lo.mean()) == pytest.approx(lo, rel=1e-10)
    assert float(out_hi.mean()) == pytest.approx(hi, rel=1e-10)
