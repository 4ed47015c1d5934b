"""Attention-logits storage dtype regression tests.

The bf16-attention-logits optimization (CLIP towers + ADM UNet + LDM UNet)
stores the (b, h, t, s) QK^T logits at the model's compute dtype instead
of f32, halving attention HBM traffic in production.  It is easy to lose
silently: dividing by a bare `np.sqrt(d)` (a strongly-typed float64
scalar) promotes bf16 logits back to f32 — precision is already bf16 from
the einsum, but the memory win evaporates.  These tests pin the scaled-
logits dtype by inspecting the jaxpr: the QK^T dot_general output AND its
scaling consumer must both stay at the module dtype.
"""
import jax
import jax.numpy as jnp
import numpy as np


def _scaled_logits_dtypes(fn, args, logits_shape):
    """(dot_dtype, consumer_dtype) for the QK^T dot_general of
    `logits_shape` and the eqn that consumes it (the 1/sqrt(d) scale)."""
    jaxpr = jax.make_jaxpr(fn)(*args).jaxpr
    for eqn in jaxpr.eqns:
        if eqn.primitive.name != "dot_general":
            continue
        out = eqn.outvars[0]
        if tuple(out.aval.shape) != logits_shape:
            continue
        consumers = [
            e for e in jaxpr.eqns
            if any(v is out for v in e.invars if hasattr(v, "aval"))
        ]
        assert consumers, "scaled-logits consumer not found"
        return out.aval.dtype, consumers[0].outvars[0].aval.dtype
    raise AssertionError(f"QK^T dot_general {logits_shape} not found")


def test_adm_attention_logits_stay_bf16():
    from clip_diffusion_tpu.models.unet import AttentionBlock

    b, hw, c, d = 2, 16, 8, 4  # 2 heads of 4 channels over 4x4 spatial
    mod = AttentionBlock(num_head_channels=d, dtype=jnp.bfloat16)
    x = jnp.zeros((b, 4, 4, c), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    dot_dt, scaled_dt = _scaled_logits_dtypes(
        lambda p, x: mod.apply(p, x), (params, x), (b, c // d, hw, hw)
    )
    assert dot_dt == jnp.bfloat16, dot_dt
    assert scaled_dt == jnp.bfloat16, (
        f"ADM QK^T scale promoted logits to {scaled_dt} — the bf16 "
        "attention-logits HBM optimization is lost (models/unet.py "
        "AttentionBlock: scale must be a self.dtype scalar)"
    )


def test_ldm_cross_attention_logits_stay_bf16():
    from clip_diffusion_tpu.models.ldm.unet import CrossAttention

    b, t, s, heads, d = 2, 6, 5, 2, 4
    mod = CrossAttention(
        query_dim=8, heads=heads, dim_head=d, dtype=jnp.bfloat16
    )
    x = jnp.zeros((b, t, 8), jnp.float32)
    ctx = jnp.zeros((b, s, 8), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    dot_dt, scaled_dt = _scaled_logits_dtypes(
        lambda p, x, c: mod.apply(p, x, c), (params, x, ctx),
        (b, heads, t, s),
    )
    assert dot_dt == jnp.bfloat16, dot_dt
    assert scaled_dt == jnp.bfloat16, (
        f"LDM QK^T scale promoted logits to {scaled_dt} — the bf16 "
        "attention-logits HBM optimization is lost (models/ldm/unet.py "
        "CrossAttention: scale must be a self.dtype scalar)"
    )


def test_clip_attention_logits_stay_bf16():
    from clip_diffusion_tpu.models.clip.model import MultiheadAttention

    b, t, width, heads = 2, 5, 8, 2
    mod = MultiheadAttention(width=width, heads=heads, dtype=jnp.bfloat16)
    x = jnp.zeros((b, t, width), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    dot_dt, scaled_dt = _scaled_logits_dtypes(
        lambda p, x: mod.apply(p, x), (params, x), (b, heads, t, t)
    )
    assert dot_dt == jnp.bfloat16, dot_dt
    assert scaled_dt == jnp.bfloat16, scaled_dt


def test_f32_config_scaling_matches_old_form():
    """The dtype-cast divisor must be bit-identical to the previous
    `/ np.sqrt(d)` form for f32 configs under PRODUCTION numerics
    (x64 disabled — the conftest enables x64 for the golden suite, where
    the old form promoted to f64, so probe in a subprocess), including
    non-power-of-two head dims where multiply-by-reciprocal would differ
    in ULPs."""
    import subprocess
    import sys

    probe = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import jax.numpy as jnp, numpy as np\n"
        "assert not jax.config.jax_enable_x64\n"
        "for d in (4, 8, 12, 64):\n"
        "    x = jax.random.normal(jax.random.PRNGKey(d), (3, 7),"
        " jnp.float32)\n"
        "    old = np.asarray(x / np.sqrt(d))\n"
        "    new = np.asarray(x / jnp.asarray(np.sqrt(d), jnp.float32))\n"
        "    assert old.dtype == new.dtype == np.float32, (d, old.dtype)\n"
        "    assert np.array_equal(old.view(np.uint32),"
        " new.view(np.uint32)), d\n"
        "print('BITWISE_OK')\n"
    )
    env = dict(
        __import__("os").environ, JAX_ENABLE_X64="0", JAX_PLATFORMS="cpu"
    )
    out = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True,
        env=env, timeout=120,
    )
    assert "BITWISE_OK" in out.stdout, (out.stdout, out.stderr)
