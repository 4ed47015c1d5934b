import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.models.esrgan import RRDBNet, convert_rrdbnet, upscale
from clip_diffusion_tpu.models.lpips import LPIPS, convert_lpips


@pytest.fixture(scope="module")
def small_rrdb():
    model = RRDBNet(num_feat=16, num_block=2, num_grow_ch=8, scale=4)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 3)))
    return model, params


def test_rrdbnet_x4_shape(small_rrdb):
    model, params = small_rrdb
    out = model.apply(params, jnp.ones((2, 8, 8, 3)))
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_rrdbnet_x2_shape():
    model = RRDBNet(num_feat=16, num_block=1, num_grow_ch=8, scale=2)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 3)))
    out = model.apply(params, jnp.ones((1, 8, 8, 3)))
    assert out.shape == (1, 16, 16, 3)


def test_upscale_clips_range(small_rrdb):
    model, params = small_rrdb
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
    out = upscale(model, params, img)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_upscale_tiled_matches_whole(small_rrdb):
    """Tiled inference with overlap must match whole-image inference in the
    interior (conv receptive field covered by 16px pad)."""
    model, params = small_rrdb
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    whole = upscale(model, params, img)
    tiled = upscale(model, params, img, tile=8)
    np.testing.assert_allclose(
        np.asarray(whole), np.asarray(tiled), atol=1e-4
    )


def test_rrdbnet_converter_structure():
    """Synthetic basicsr-style state dict converts onto the flax tree."""
    from clip_diffusion_tpu.models.convert import validate_against

    model = RRDBNet(num_feat=8, num_block=2, num_grow_ch=4, scale=4)
    template = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 3)))

    rng = np.random.default_rng(0)
    sd = {}

    def add_conv(name, cin, cout):
        sd[f"{name}.weight"] = rng.normal(size=(cout, cin, 3, 3)).astype("f")
        sd[f"{name}.bias"] = np.zeros(cout, "f")

    add_conv("conv_first", 3, 8)
    for b in range(2):
        for r in range(1, 4):
            cin = 8
            for k in range(1, 6):
                cout = 4 if k < 5 else 8
                add_conv(f"body.{b}.rdb{r}.conv{k}", cin, cout)
                cin += 4
    add_conv("conv_body", 8, 8)
    add_conv("conv_up1", 8, 8)
    add_conv("conv_up2", 8, 8)
    add_conv("conv_hr", 8, 8)
    add_conv("conv_last", 8, 3)

    converted = convert_rrdbnet(sd)
    problems = validate_against(template, converted)
    assert not problems, problems[:10]


# ---------------- LPIPS ----------------

@pytest.fixture(scope="module")
def lpips():
    model = LPIPS()
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)), jnp.ones((1, 64, 64, 3))
    )
    # lpips lin heads are non-negative in the real checkpoints; make the
    # random stand-in behave the same so distances are >= 0
    params = jax.tree_util.tree_map(jnp.abs, params)
    return model, params


def test_lpips_self_zero(lpips):
    model, params = lpips
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), minval=-1)
    d = model.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_lpips_monotone_with_distortion(lpips):
    model, params = lpips
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3), minval=-1)
    n = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    d1 = float(model.apply(params, x, jnp.clip(x + 0.1 * n, -1, 1))[0])
    d2 = float(model.apply(params, x, jnp.clip(x + 0.6 * n, -1, 1))[0])
    assert 0 <= d1 < d2


def test_lpips_grad_finite(lpips):
    model, params = lpips
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3), minval=-1)
    y = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3), minval=-1)
    g = jax.grad(lambda a: model.apply(params, a, y).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_lpips_converter_structure():
    from clip_diffusion_tpu.models.convert import validate_against

    model = LPIPS()
    template = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)), jnp.ones((1, 32, 32, 3))
    )
    rng = np.random.default_rng(0)
    # torchvision VGG16 feature conv indices per lpips slice
    slice_convs = {
        1: [(0, 3, 64), (2, 64, 64)],
        2: [(5, 64, 128), (7, 128, 128)],
        3: [(10, 128, 256), (12, 256, 256), (14, 256, 256)],
        4: [(17, 256, 512), (19, 512, 512), (21, 512, 512)],
        5: [(24, 512, 512), (26, 512, 512), (28, 512, 512)],
    }
    sd = {}
    for s, convs in slice_convs.items():
        for idx, cin, cout in convs:
            sd[f"net.slice{s}.{idx}.weight"] = rng.normal(
                size=(cout, cin, 3, 3)
            ).astype("f")
            sd[f"net.slice{s}.{idx}.bias"] = np.zeros(cout, "f")
    for i, ch in enumerate([64, 128, 256, 512, 512]):
        sd[f"lin{i}.model.1.weight"] = np.abs(
            rng.normal(size=(1, ch, 1, 1))
        ).astype("f")
    converted = convert_lpips(sd)
    problems = validate_against(template, converted)
    assert not problems, problems[:10]
