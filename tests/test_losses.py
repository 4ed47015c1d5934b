import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.guidance.losses import (
    aesthetic_loss,
    l2_normalize,
    ms_ssim,
    rgb_range_loss,
    square_spherical_distance_loss,
    structural_dissimilarity_loss,
    total_variational_loss,
)
from clip_diffusion_tpu.models.aesthetic import (
    LinearAestheticPredictor,
    MLPAestheticPredictor,
    make_aesthetic_predictor,
)


# ---------------- spherical distance ----------------

def test_spherical_distance_closed_form():
    """For unit vectors at angle theta: chord = 2 sin(theta/2), so the loss
    is 2 * (theta/2)^2."""
    for theta in [0.1, 0.5, 1.0, 2.0]:
        x = jnp.array([[1.0, 0.0]])
        y = jnp.array([[np.cos(theta), np.sin(theta)]])
        loss = float(square_spherical_distance_loss(x, y)[0])
        assert loss == pytest.approx(2 * (theta / 2) ** 2, rel=1e-5)


def test_spherical_distance_identical_is_zero():
    x = jnp.array([[3.0, 4.0, 0.0]])
    assert float(square_spherical_distance_loss(x, 2 * x)[0]) == pytest.approx(0.0, abs=1e-9)


def test_spherical_distance_scale_invariant():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 8))
    y = jax.random.normal(jax.random.fold_in(key, 1), (4, 8))
    d1 = square_spherical_distance_loss(x, y)
    d2 = square_spherical_distance_loss(10 * x, 0.1 * y)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)


def test_spherical_distance_broadcast_shape():
    """Call-site shape: (cuts, 1, D) x (1, prompts, D) -> (cuts, prompts)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 1, 512))
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 512))
    d = square_spherical_distance_loss(x, y)
    assert d.shape == (16, 3)


# ---------------- total variation ----------------

def test_tv_loss_constant_zero():
    x = jnp.full((2, 8, 8, 3), 0.7)
    np.testing.assert_allclose(np.asarray(total_variational_loss(x)), 0.0, atol=1e-10)


def test_tv_loss_finite_difference_oracle():
    """Compare against a direct numpy implementation with replicate pad."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 6, 7, 3))
    padded = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    dx = padded[:, :-1, 1:, :] - padded[:, :-1, :-1, :]
    dy = padded[:, 1:, :-1, :] - padded[:, :-1, :-1, :]
    expected = (dx**2 + dy**2).mean(axis=(1, 2, 3))
    got = np.asarray(total_variational_loss(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_tv_loss_shape():
    assert total_variational_loss(jnp.ones((5, 8, 8, 3))).shape == (5,)


# ---------------- range loss ----------------

def test_range_loss_zero_inside():
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 4, 4, 3)))
    np.testing.assert_allclose(np.asarray(rgb_range_loss(x)), 0.0, atol=1e-12)


def test_range_loss_quadratic_outside():
    x = jnp.full((1, 2, 2, 3), 1.5)
    np.testing.assert_allclose(np.asarray(rgb_range_loss(x)), 0.25, rtol=1e-6)


# ---------------- MS-SSIM ----------------

def _imgs(shape=(2, 192, 192, 3), seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(0, 1, shape), jnp.float32)


def test_ms_ssim_self_is_one():
    x = _imgs()
    assert float(ms_ssim(x, x)) == pytest.approx(1.0, abs=1e-4)


def test_ms_ssim_decreases_with_noise():
    x = _imgs()
    rng = np.random.default_rng(2)
    y1 = jnp.clip(x + 0.05 * jnp.asarray(rng.normal(size=x.shape), jnp.float32), 0, 1)
    y2 = jnp.clip(x + 0.3 * jnp.asarray(rng.normal(size=x.shape), jnp.float32), 0, 1)
    s1 = float(ms_ssim(x, y1))
    s2 = float(ms_ssim(x, y2))
    assert 1.0 > s1 > s2 > 0.0


def test_structural_dissimilarity_range():
    x = _imgs() * 2 - 1  # [-1,1] like the call site
    y = _imgs(seed=3) * 2 - 1
    d = float(structural_dissimilarity_loss(x, y))
    assert 0.0 < d < 1.0
    assert float(structural_dissimilarity_loss(x, x)) == pytest.approx(0.0, abs=1e-4)


def test_ms_ssim_gradient_finite():
    x = _imgs((1, 192, 192, 3))
    y = _imgs((1, 192, 192, 3), seed=4)
    g = jax.grad(lambda a: ms_ssim(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()


# ---------------- aesthetic predictors ----------------

def test_linear_predictor_shapes():
    model = LinearAestheticPredictor()
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 512)))
    out = model.apply(params, jnp.ones((7, 512)))
    assert out.shape == (7, 1)


def test_mlp_predictor_shapes():
    model = MLPAestheticPredictor()
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 768)))
    out = model.apply(params, jnp.ones((5, 768)))
    assert out.shape == (5, 1)


def test_make_aesthetic_predictor_selection():
    assert isinstance(make_aesthetic_predictor("ViT-L/14"), MLPAestheticPredictor)
    assert isinstance(make_aesthetic_predictor("ViT-B/32"), LinearAestheticPredictor)


def test_aesthetic_loss_normalizes():
    model = LinearAestheticPredictor()
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 512)))
    fn = lambda e: model.apply(params, e)
    emb = jax.random.normal(jax.random.PRNGKey(1), (16, 512))
    # scale invariance through the internal L2 normalization
    l1 = float(aesthetic_loss(fn, emb))
    l2 = float(aesthetic_loss(fn, emb * 100))
    assert l1 == pytest.approx(l2, rel=1e-5)


def test_l2_normalize():
    x = jnp.array([[3.0, 4.0]])
    np.testing.assert_allclose(
        np.asarray(l2_normalize(x)), [[0.6, 0.8]], rtol=1e-6
    )
