import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.utils.checkpoint import (
    SamplingState,
    load_params,
    save_params,
)


def test_params_roundtrip(tmp_path):
    params = {
        "params": {
            "dense": {"kernel": jnp.ones((4, 8)), "bias": jnp.zeros((8,))},
        }
    }
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = load_params(path, params)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["dense"]["kernel"]), 1.0
    )
    assert restored["params"]["dense"]["bias"].shape == (8,)


def test_sampling_state_roundtrip(tmp_path):
    from clip_diffusion_tpu.diffusion.sampling import init_history

    shape = (2, 8, 8, 3)
    state = SamplingState(
        x=jnp.full(shape, 0.3),
        step=17,
        eps_history=init_history(shape).at[0].set(1.5),
        history_count=1,
        key_data=np.asarray(jax.random.PRNGKey(42)),
    )
    path = str(tmp_path / "state.npz")
    state.save(path)
    back = SamplingState.load(path)
    np.testing.assert_allclose(np.asarray(back.x), 0.3)
    assert back.step == 17
    assert back.history_count == 1
    np.testing.assert_array_equal(
        np.asarray(back.key_data), np.asarray(jax.random.PRNGKey(42))
    )
    np.testing.assert_allclose(np.asarray(back.eps_history[0]), 1.5)
