import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.diffusion.sampling import dynamic_threshold
from clip_diffusion_tpu.ops.quantile import (
    dynamic_threshold_fast,
    histogram_abs_quantile,
    histogram_quantile_pallas,
)


def test_histogram_quantile_matches_sort():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2, (3, 50000)), jnp.float32)
    for q in (0.5, 0.9, 0.995):
        approx = np.asarray(histogram_abs_quantile(x, q))
        exact = np.asarray(jnp.quantile(jnp.abs(x), q, axis=1))
        np.testing.assert_allclose(approx, exact, atol=4 * 2 / 4096 + 1e-3)


def test_histogram_quantile_extremes():
    x = jnp.asarray(np.linspace(-1, 1, 1000)[None], jnp.float32)
    hi = float(histogram_abs_quantile(x, 1.0)[0])
    assert hi == pytest.approx(1.0, abs=1e-3)


def test_dynamic_threshold_fast_matches_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1.5, (2, 64, 64, 3)), jnp.float32)
    fast = np.asarray(dynamic_threshold_fast(x, 0.995))
    exact = np.asarray(dynamic_threshold(x, 0.995))
    np.testing.assert_allclose(fast, exact, atol=5e-3)
    assert np.abs(fast).max() <= 1.0 + 1e-6


def test_dynamic_threshold_fast_inrange_noop():
    x = jnp.full((1, 8, 8, 3), 0.4)
    out = np.asarray(dynamic_threshold_fast(x, 0.995))
    np.testing.assert_allclose(out, 0.4, atol=1e-6)


def test_pallas_quantile_interpret_matches():
    """Pallas kernel in interpret mode (CPU) against the XLA version."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 2, (2, 16384)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        approx = np.asarray(histogram_quantile_pallas(x, 0.995, bins=2048,
                                                      block=8192))
    exact = np.asarray(jnp.quantile(jnp.abs(x), 0.995, axis=1))
    np.testing.assert_allclose(approx, exact, atol=4 * 2 / 2048 + 2e-3)


def test_quantile_edge_cases():
    from clip_diffusion_tpu.ops.quantile import histogram_abs_quantile

    # constant rows: every quantile equals the constant
    x = jnp.full((2, 1000), 0.7)
    np.testing.assert_allclose(
        np.asarray(histogram_abs_quantile(x, 0.5)), 0.7, atol=1e-3
    )
    # all-zero row must not NaN
    z = jnp.zeros((1, 512))
    assert np.isfinite(np.asarray(histogram_abs_quantile(z, 0.995))).all()
    # q=1.0 approaches the max
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((1, 4096)), jnp.float32)
    hi = float(jnp.abs(v).max())
    got = float(histogram_abs_quantile(v, 1.0)[0])
    assert abs(got - hi) < hi * 0.01 + 1e-3
