import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.guidance.cutouts import (
    CutoutSpec,
    make_cutouts,
    make_cutouts_batch,
)
from clip_diffusion_tpu.ops.resize import pad_to_square_resize
from clip_diffusion_tpu.ops.augment import rgb_to_grayscale


SPEC = CutoutSpec(cut_size=16, max_overview=14, max_inner=12, augment=False)


def _img(h=32, w=48):
    key = jax.random.PRNGKey(0)
    return jax.random.uniform(key, (h, w, 3), minval=-1.0, maxval=1.0)


def test_shapes_and_weights():
    cuts, w = make_cutouts(
        _img(), jax.random.PRNGKey(1), jnp.int32(14), jnp.int32(2),
        jnp.float32(5.0), jnp.float32(0.7), SPEC,
    )
    assert cuts.shape == (26, 16, 16, 3)
    assert w.shape == (26,)
    np.testing.assert_allclose(float(w.sum()), 1.0, atol=1e-6)
    # 14 overview active + 2 inner active
    assert int((w > 0).sum()) == 16
    np.testing.assert_allclose(np.asarray(w[w > 0]), 1 / 16, atol=1e-7)


def test_active_slot_layout():
    _, w = make_cutouts(
        _img(), jax.random.PRNGKey(1), jnp.int32(4), jnp.int32(12),
        jnp.float32(5.0), jnp.float32(0.0), SPEC,
    )
    w = np.asarray(w)
    assert (w[:4] > 0).all()       # 4 overview slots
    assert (w[4:14] == 0).all()    # padded overview slots
    assert (w[14:26] > 0).all()    # all 12 inner slots


def test_overview_variants_few():
    """n_overview <= 4: slots are id / gray / flip / gray-flip of the padded
    resize (reference cutouts.py:67-76)."""
    img = _img()
    cuts, _ = make_cutouts(
        img, jax.random.PRNGKey(2), jnp.int32(4), jnp.int32(2),
        jnp.float32(5.0), jnp.float32(0.7), SPEC,
    )
    base = pad_to_square_resize((img + 1) / 2, 16)
    np.testing.assert_allclose(np.asarray(cuts[0]), np.asarray(base), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cuts[1]), np.asarray(rgb_to_grayscale(base)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cuts[2]), np.asarray(base[:, ::-1, :]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cuts[3]), np.asarray(rgb_to_grayscale(base)[:, ::-1, :]), atol=1e-5
    )


def test_overview_variants_many():
    """n_overview > 4: all slots are identical copies (reference
    cutouts.py:77-79)."""
    img = _img()
    cuts, _ = make_cutouts(
        img, jax.random.PRNGKey(2), jnp.int32(14), jnp.int32(2),
        jnp.float32(5.0), jnp.float32(0.7), SPEC,
    )
    for i in range(1, 14):
        np.testing.assert_allclose(
            np.asarray(cuts[i]), np.asarray(cuts[0]), atol=1e-6
        )


def test_inner_gray_quirk():
    """Reference grays inner slots i <= int(p * n): with p=0 slot 0 is still
    grayscaled (reference cutouts.py:102-103)."""
    img = _img()
    cuts, _ = make_cutouts(
        img, jax.random.PRNGKey(3), jnp.int32(0), jnp.int32(12),
        jnp.float32(5.0), jnp.float32(0.0), SPEC,
    )
    inner = np.asarray(cuts[14:26])
    # slot 0 grayscale: channels equal
    assert np.abs(inner[0][..., 0] - inner[0][..., 1]).max() < 1e-6
    # slot 1 not grayscale
    assert np.abs(inner[1][..., 0] - inner[1][..., 1]).max() > 1e-3


def test_inner_gray_portion():
    img = _img()
    cuts, _ = make_cutouts(
        img, jax.random.PRNGKey(3), jnp.int32(0), jnp.int32(12),
        jnp.float32(5.0), jnp.float32(0.5), SPEC,
    )
    inner = np.asarray(cuts[14:26])
    # i <= int(0.5*12)=6 -> slots 0..6 gray, 7..11 color
    for i in range(7):
        assert np.abs(inner[i][..., 0] - inner[i][..., 2]).max() < 1e-6, i
    for i in range(7, 12):
        assert np.abs(inner[i][..., 0] - inner[i][..., 2]).max() > 1e-3, i


def test_inner_cuts_differ():
    img = _img()
    cuts, _ = make_cutouts(
        img, jax.random.PRNGKey(4), jnp.int32(0), jnp.int32(12),
        jnp.float32(5.0), jnp.float32(0.0), SPEC,
    )
    inner = np.asarray(cuts[14:26])
    assert np.abs(inner[1] - inner[2]).max() > 1e-3


def test_cut_values_in_unit_range():
    cuts, _ = make_cutouts(
        _img(), jax.random.PRNGKey(5), jnp.int32(14), jnp.int32(12),
        jnp.float32(5.0), jnp.float32(0.7), SPEC,
    )
    # cubic resampling overshoots slightly (negative kernel lobes), exactly
    # as resize-right does in the reference; bound the overshoot.
    assert float(cuts.min()) >= -0.15
    assert float(cuts.max()) <= 1.15


def test_batched_cutouts_with_repeats():
    imgs = jnp.stack([_img(), _img() * 0.5])
    spec = SPEC
    cuts, w = make_cutouts_batch(
        imgs, jax.random.PRNGKey(6), jnp.int32(4), jnp.int32(2),
        jnp.float32(5.0), jnp.float32(0.7), spec, repeats=4,
    )
    assert cuts.shape == (2, 4 * 26, 16, 16, 3)
    assert w.shape == (2, 4 * 26)
    np.testing.assert_allclose(np.asarray(w.sum(axis=1)), 1.0, atol=1e-6)
    # repeats have independent randomness: inner slot 1 differs across groups
    a = np.asarray(cuts[0, 14 + 1])
    b = np.asarray(cuts[0, 26 + 14 + 1])
    assert np.abs(a - b).max() > 1e-4


def test_gradients_flow_to_image():
    img = _img()
    spec = CutoutSpec(cut_size=16, augment=True)

    def f(x):
        cuts, w = make_cutouts(
            x, jax.random.PRNGKey(7), jnp.int32(4), jnp.int32(4),
            jnp.float32(5.0), jnp.float32(0.5), spec,
        )
        return jnp.sum(w[:, None] * cuts.mean(axis=(1, 2, 3))[:, None])

    g = jax.grad(f)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_single_compiled_program_across_schedule_phases():
    """All four schedule phases reuse one compiled program (counts are data)."""
    img = _img()
    f = jax.jit(
        lambda x, no, ni, p, g: make_cutouts(x, jax.random.PRNGKey(0), no, ni, p, g, SPEC),
        static_argnames=(),
    )
    for no, ni, gr in [(14, 2, 0.7), (12, 4, 0.6), (4, 2, 0.45), (0, 12, 0.0)]:
        cuts, w = f(img, jnp.int32(no), jnp.int32(ni), jnp.float32(5.0), jnp.float32(gr))
        assert cuts.shape == (26, 16, 16, 3)
        assert int((np.asarray(w) > 0).sum()) == no + ni
    assert f._cache_size() == 1
