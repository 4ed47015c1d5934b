import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.ops.augment import (
    AugmentConfig,
    _color_jitter,
    _random_affine,
    augment_batch,
    rgb_to_grayscale,
)


def test_grayscale_luma():
    img = jnp.zeros((4, 4, 3)).at[..., 0].set(1.0)  # pure red
    g = rgb_to_grayscale(img)
    np.testing.assert_allclose(np.asarray(g), 0.299, atol=1e-6)
    # channels equal
    assert float(jnp.abs(g[..., 0] - g[..., 1]).max()) == 0.0


def test_affine_identity_on_constant_interior():
    """A constant image stays constant in the interior under small affine
    (only border fill can change values)."""
    img = jnp.full((64, 64, 3), 0.5)
    out = _random_affine(img, jax.random.PRNGKey(0), degrees=10.0, translate=0.05)
    np.testing.assert_allclose(np.asarray(out[16:-16, 16:-16]), 0.5, atol=1e-5)


def test_affine_rotates():
    img = jnp.zeros((33, 33, 1)).at[16, 24, 0].set(1.0)
    # large deterministic-ish rotation: average over keys, mass must move
    out = _random_affine(img, jax.random.PRNGKey(3), degrees=45.0, translate=0.0)
    # total mass approximately preserved (bilinear)
    assert 0.8 < float(out.sum()) < 1.2


def test_color_jitter_bounded():
    img = jnp.full((8, 8, 3), 0.5)
    out = _color_jitter(img, jax.random.PRNGKey(1), 0.1)
    assert 0.3 < float(out.mean()) < 0.7


def test_augment_batch_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(jax.random.PRNGKey(5), (6, 16, 16, 3))
    out1 = augment_batch(imgs, key)
    out2 = augment_batch(imgs, key)
    assert out1.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    out3 = augment_batch(imgs, jax.random.PRNGKey(9))
    assert float(jnp.abs(out1 - out3).max()) > 1e-3


def test_augment_per_image_independent():
    imgs = jnp.stack([jnp.full((16, 16, 3), 0.5)] * 4)
    out = augment_batch(imgs, jax.random.PRNGKey(2))
    # identical inputs must receive different augmentations
    assert float(jnp.abs(out[0] - out[1]).max()) > 1e-4


def test_gradients_flow_through_augment():
    imgs = jnp.full((2, 16, 16, 3), 0.5)

    def f(x):
        return augment_batch(x, jax.random.PRNGKey(0)).sum()

    g = jax.grad(f)(imgs)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_flip_probability():
    """Over many keys ~half the images flip."""
    img = jnp.zeros((1, 4, 4, 3)).at[0, 0, 0, 0].set(1.0)
    cfg = AugmentConfig(noise_std=0.0, degrees=0.0, translate=0.0,
                        grayscale_p=0.0, jitter=0.0)
    flipped = 0
    for s in range(200):
        out = augment_batch(img, jax.random.PRNGKey(s), cfg)
        if float(out[0, 0, 3, 0]) > 0.5:
            flipped += 1
    assert 60 < flipped < 140


# ---------------- 3-shear affine (TPU-fast path) ----------------

def _smooth_image(s=64):
    ii = np.arange(s, dtype=np.float32)
    ys, xs = np.meshgrid(ii, ii, indexing="ij")
    img = 0.5 + 0.3 * np.sin(2 * np.pi * ys / s) * np.cos(2 * np.pi * xs / s)
    return jnp.asarray(np.stack([img, img * 0.8, img * 0.6], -1))


def test_shear_affine_matches_gather_on_smooth_content():
    """The 3-shear decomposition realizes the same affine source map as the
    direct bilinear warp; on smooth content they agree closely (kernel
    differences only touch high frequencies)."""
    from clip_diffusion_tpu.ops.augment import _random_affine

    img = _smooth_image(64)
    for seed in range(4):
        key = jax.random.PRNGKey(seed)
        a = np.asarray(_random_affine(img, key, 10.0, 0.05, impl="shear"))
        b = np.asarray(_random_affine(img, key, 10.0, 0.05, impl="gather"))
        interior = (slice(12, -12), slice(12, -12))
        assert np.abs(a[interior] - b[interior]).max() < 0.02
        assert np.abs(a[interior] - b[interior]).mean() < 0.003


def test_shear_affine_exact_on_affine_ramp():
    """1-D linear interpolation is exact on affine functions, so the shear
    composition reproduces the exact warp of a linear ramp (interior)."""
    from clip_diffusion_tpu.ops.augment import _random_affine

    s = 64
    ii = np.arange(s, dtype=np.float32)
    ys, xs = np.meshgrid(ii, ii, indexing="ij")
    ramp = jnp.asarray(
        np.stack([0.2 + 0.01 * ys, 0.3 + 0.008 * xs,
                  0.1 + 0.005 * (ys + xs)], -1)
    )
    key = jax.random.PRNGKey(3)
    a = np.asarray(_random_affine(ramp, key, 10.0, 0.05, impl="shear"))
    b = np.asarray(_random_affine(ramp, key, 10.0, 0.05, impl="gather"))
    interior = (slice(14, -14), slice(14, -14))
    np.testing.assert_allclose(a[interior], b[interior], atol=2e-5)


def test_shear_affine_identity_at_zero():
    from clip_diffusion_tpu.ops.augment import _affine_shear

    img = _smooth_image(32)
    out = _affine_shear(img, jnp.float32(0.0), jnp.float32(0.0),
                        jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_shear_affine_grads_finite():
    from clip_diffusion_tpu.ops.augment import _random_affine

    img = _smooth_image(32)
    g = jax.grad(
        lambda im: jnp.sum(_random_affine(im, jax.random.PRNGKey(0), 10.0,
                                          0.05, impl="shear"))
    )(img)
    assert np.isfinite(np.asarray(g)).all()


def test_shear_cols_equals_transposed_shear_rows():
    from clip_diffusion_tpu.ops.augment import _shear_cols, _shear_rows

    img = _smooth_image(32)
    shifts = jnp.linspace(-3.0, 3.0, 32)
    a = _shear_cols(img, shifts)
    b = jnp.swapaxes(_shear_rows(jnp.swapaxes(img, 0, 1), shifts), 0, 1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
