"""bf16 fast-path GroupNorm regression tests (round-4 MFU work).

`GroupNorm32` routes bf16 inputs through `_FastGroupNormCore`: f32
statistics + ONE bf16 normalization FMA over the big tensor, instead of
round-tripping the whole activation through `nn.GroupNorm(dtype=f32)`.
These tests pin (a) numerical agreement with the exact f32 path at bf16
tolerance, (b) the param tree staying identical to `nn.GroupNorm`'s
(`GroupNorm_0/{scale, bias}` — converters/checkpoints depend on it), and
(c) the full-shape elementwise ops staying bf16 in the jaxpr (the HBM win;
the only permitted full-shape f32 tensors are the convert/square feeding
the stat reductions, which XLA fuses into the reduce)."""

import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.models.unet import GroupNorm32


def _legacy_f32(x_f32, params, eps=1e-5):
    import flax.linen as nn

    groups = min(32, x_f32.shape[-1])
    mod = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    return mod.apply({"params": params}, x_f32)


def test_fast_path_matches_exact_at_bf16_tolerance():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 64), jnp.float32) * 3.0 + 1.5
    mod = GroupNorm32()
    params = mod.init(jax.random.PRNGKey(1), x)
    # non-trivial affine so scale/bias actually participate
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(key, p.shape, p.dtype), params
    )
    exact = mod.apply(params, x)
    fast = mod.apply(params, x.astype(jnp.bfloat16)).astype(jnp.float32)
    assert exact.dtype == jnp.float32
    np.testing.assert_allclose(fast, exact, atol=6e-2, rtol=6e-2)


def test_param_tree_identical_between_paths():
    mod = GroupNorm32()
    x32 = jnp.zeros((1, 4, 4, 64), jnp.float32)
    x16 = jnp.zeros((1, 4, 4, 64), jnp.bfloat16)
    p32 = mod.init(jax.random.PRNGKey(0), x32)
    p16 = mod.init(jax.random.PRNGKey(0), x16)
    def flat(p):
        return {
            jax.tree_util.keystr(path): (leaf.shape, leaf.dtype)
            for path, leaf in jax.tree_util.tree_flatten_with_path(p)[0]
        }

    assert flat(p32) == flat(p16)
    assert any("GroupNorm_0" in k for k in flat(p16))


def _walk_eqns(jaxpr):
    """All eqns including call-primitive sub-jaxprs (remat / pjit / scan
    wrapping would otherwise hide promoted full-shape ops — ADVICE r4)."""
    from jax.extend.core import Jaxpr

    def subs(v):
        if isinstance(v, Jaxpr):
            yield v
        elif hasattr(v, "jaxpr") and isinstance(v.jaxpr, Jaxpr):
            yield v.jaxpr  # ClosedJaxpr
        elif isinstance(v, (tuple, list)):
            for item in v:
                yield from subs(item)

    for eqn in jaxpr.eqns:
        yield eqn
        for v in eqn.params.values():
            for sub in subs(v):
                yield from _walk_eqns(sub)


def test_full_shape_elementwise_ops_stay_bf16():
    import functools

    mod = GroupNorm32()
    x = jnp.zeros((1, 16, 16, 64), jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)
    # wrap in remat on purpose: the traversal must see through
    # call primitives, not just the top-level eqn list
    fn = jax.checkpoint(lambda p, x: mod.apply(p, x))
    jaxpr = jax.make_jaxpr(fn)(params, x).jaxpr
    full = tuple(x.shape)
    saw_fma = False
    for eqn in _walk_eqns(jaxpr):
        if eqn.primitive.name not in ("mul", "add", "sub"):
            continue
        out = eqn.outvars[0]
        if tuple(out.aval.shape) != full:
            continue
        saw_fma = True
        assert out.aval.dtype == jnp.bfloat16, (
            f"full-shape {eqn.primitive.name} at {out.aval.dtype} — the "
            "bf16 GroupNorm FMA was promoted (models/unet.py "
            "_FastGroupNormCore)"
        )
    assert saw_fma, "normalization FMA not found in jaxpr"


def test_fast_path_grad_finite_and_close():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 8, 8, 64), jnp.float32)
    mod = GroupNorm32()
    params = mod.init(jax.random.PRNGKey(3), x)

    def loss32(z):
        return jnp.sum(mod.apply(params, z) ** 2)

    def loss16(z):
        return jnp.sum(
            mod.apply(params, z.astype(jnp.bfloat16)).astype(jnp.float32)
            ** 2
        )

    g32 = jax.grad(loss32)(x)
    g16 = jax.grad(loss16)(x)
    assert np.all(np.isfinite(np.asarray(g16)))
    np.testing.assert_allclose(g16, g32, atol=0.15, rtol=0.3)
