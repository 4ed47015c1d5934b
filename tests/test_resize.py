import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.ops.resize import (
    axis_resize_weights,
    crop_resize,
    pad_to_square_resize,
    resize_image,
)


def test_weight_rows_normalized():
    for method in ("linear", "cubic"):
        w = axis_resize_weights(224, 512, 13.0, 301.0, method)
        np.testing.assert_allclose(np.asarray(w.sum(axis=1)), 1.0, atol=1e-5)
        assert w.shape == (224, 512)


def test_identity_when_size_matches():
    """Resizing a window of size == out_size starting at an integer is an
    exact slice (kernel hits integer sample points)."""
    w = axis_resize_weights(8, 32, 5.0, 8.0, "cubic")
    expected = np.zeros((8, 32))
    expected[np.arange(8), 5 + np.arange(8)] = 1.0
    np.testing.assert_allclose(np.asarray(w), expected, atol=1e-6)


def test_crop_resize_identity_slice():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (32, 32, 3))
    out = crop_resize(img, jnp.float32(4), jnp.float32(7), jnp.float32(8),
                      jnp.float32(8), 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[4:12, 7:15]),
                               atol=1e-5)


def test_downsample_preserves_constant_and_linear():
    """Antialiased resize must reproduce constants exactly and linear ramps
    in the interior (partition of unity + symmetry)."""
    h = 64
    ramp = jnp.broadcast_to(jnp.linspace(0, 1, h)[:, None, None], (h, h, 1))
    const = jnp.full((h, h, 1), 0.37)
    for method in ("linear", "cubic"):
        out_c = crop_resize(const, 0.0, 0.0, float(h), float(h), 16, method)
        np.testing.assert_allclose(np.asarray(out_c), 0.37, atol=1e-5)
        out_r = crop_resize(ramp, 0.0, 0.0, float(h), float(h), 16, method)
        # interior rows follow the ramp at the resampled coordinates
        centers = (np.arange(16) + 0.5) * (h / 16) - 0.5
        expected = centers / (h - 1)
        np.testing.assert_allclose(
            np.asarray(out_r[2:-2, 8, 0]), expected[2:-2], atol=1e-3
        )


def test_upsample_smooth():
    img = jnp.zeros((8, 8, 1)).at[4, 4, 0].set(1.0)
    out = resize_image(img, 32, "cubic")
    assert out.shape == (32, 32, 1)
    # energy roughly preserved under normalization-by-rows
    assert 0.5 < float(out.sum()) * (8 / 32) ** 2 < 2.0


def test_pad_to_square_resize_landscape():
    """768x512-style landscape: content occupies the middle band vertically."""
    img = jnp.ones((32, 64, 3))
    out = pad_to_square_resize(img, 16)
    assert out.shape == (16, 16, 3)
    # top/bottom quarter are (zero) padding; cubic ringing allowed at the
    # band boundary rows
    np.testing.assert_allclose(np.asarray(out[:2]), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[-2:]), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[6:10]), 1.0, atol=1e-3)
    # width direction unpadded
    np.testing.assert_allclose(np.asarray(out[8, :, 0]), 1.0, atol=1e-3)


def test_square_input_no_padding():
    key = jax.random.PRNGKey(1)
    img = jax.random.uniform(key, (32, 32, 3))
    out1 = pad_to_square_resize(img, 16)
    out2 = resize_image(img, 16)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_gradients_flow_through_crop_resize():
    img = jnp.ones((32, 32, 3))

    def f(x):
        return crop_resize(x, 3.0, 3.0, 20.0, 20.0, 8).sum()

    g = jax.grad(f)(img)
    assert float(jnp.abs(g).sum()) > 0
    # gradient is zero outside the crop window
    np.testing.assert_allclose(np.asarray(g[:2]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[25:]), 0.0, atol=1e-6)


def test_traced_geometry_no_retrace():
    """Crop geometry is data: different sizes reuse one compiled program."""
    img = jnp.ones((32, 32, 3))
    f = jax.jit(lambda x, y0, x0, s: crop_resize(x, y0, x0, s, s, 8))
    out1 = f(img, jnp.float32(0), jnp.float32(0), jnp.float32(10))
    out2 = f(img, jnp.float32(5), jnp.float32(5), jnp.float32(20))
    assert out1.shape == out2.shape == (8, 8, 3)
    assert f._cache_size() == 1


def test_resize_center_crop_square_equals_resize():
    """On a square image, resize+center-crop degenerates to a plain resize."""
    from clip_diffusion_tpu.ops.resize import resize_center_crop

    img = jax.random.uniform(jax.random.PRNGKey(7), (64, 64, 3))
    np.testing.assert_allclose(
        np.asarray(resize_center_crop(img, 16)),
        np.asarray(resize_image(img, 16)),
        atol=1e-6,
    )


def test_resize_center_crop_nonsquare_matches_pil():
    """Non-square input: resize-shorter-side + center-crop must match the
    reference's torchvision preprocess (reference functional.py:19-26).
    Oracle: PIL bicubic resize (shorter side -> out) + center crop — same
    Catmull-Rom a=-0.5 kernel family as ops/resize."""
    from PIL import Image

    from clip_diffusion_tpu.ops.resize import resize_center_crop

    rng = np.random.default_rng(0)
    h, w, out = 48, 96, 24
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)

    got = np.asarray(resize_center_crop(jnp.asarray(img), out))
    assert got.shape == (out, out, 3)

    pil = Image.fromarray((img * 255).astype(np.uint8))
    scale = out / min(h, w)
    rw, rh = round(w * scale), round(h * scale)
    resized = pil.resize((rw, rh), Image.BICUBIC)
    left = (rw - out) // 2
    top = (rh - out) // 2
    oracle = (
        np.asarray(resized.crop((left, top, left + out, top + out)), np.float32)
        / 255.0
    )
    # uint8 quantization + boundary handling differences: loose tolerance
    assert np.abs(got - oracle).mean() < 0.02
    assert np.abs(got - oracle).max() < 0.12
