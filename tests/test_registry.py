"""Serving-side model registry: name -> finetuned UNet checkpoint.

The reference capability: a client picks 通用/景觀/建築 per request and the
server loads the matching finetuned UNet (reference
clip_diffusion_main_server.ipynb cells 14-16, sample.py:64,97-99).  Here the
UNetRegistry maps names to converted orbax checkpoints, loaded and cached on
first request, and the HTTP API accepts "model_type" in /guided_sample.
"""

import json
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_diffusion_tpu.models.unet import UNetConfig, UNetModel
from clip_diffusion_tpu.runtime.registry import UNetRegistry
from clip_diffusion_tpu.runtime.server import ClipDiffusionServer
from clip_diffusion_tpu.utils.checkpoint import save_params


def _tiny_unet_params(seed):
    ucfg = UNetConfig.tiny(64)
    unet = UNetModel(ucfg)
    params = unet.init(
        jax.random.PRNGKey(seed), jnp.ones((1, 64, 64, 3)), jnp.zeros((1,))
    )
    # perturb every leaf: ADM zero-inits its output conv, so UNPERTURBED
    # fresh inits all output zeros and two "finetunes" would be
    # behaviorally identical regardless of seed
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(
            jax.random.PRNGKey(seed + 77), p.shape, p.dtype
        ),
        params,
    )
    return ucfg, jax.tree_util.tree_map(np.asarray, params)


@pytest.fixture()
def two_checkpoints(tmp_path):
    ucfg, p1 = _tiny_unet_params(seed=1)
    _, p2 = _tiny_unet_params(seed=2)
    d1 = str(tmp_path / "guided_unet_custom_landscape")
    d2 = str(tmp_path / "guided_unet_custom_building")
    save_params(d1, p1)
    save_params(d2, p2)
    return ucfg, (d1, p1), (d2, p2), tmp_path


def test_registry_load_cache_and_aliases(two_checkpoints):
    ucfg, (d1, p1), (d2, p2), _ = two_checkpoints
    reg = UNetRegistry(unet_config=ucfg, param_dtype=jnp.float32)
    reg.register("landscape", d1)
    reg.register("building", d2)

    loaded1 = reg.load("landscape")
    leaves_saved = jax.tree_util.tree_leaves(p1)
    leaves_loaded = jax.tree_util.tree_leaves(loaded1)
    for a, b in zip(leaves_saved, leaves_loaded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # cached: second load returns the identical device tree
    assert reg.load("landscape") is loaded1
    # two registered names load distinct weights
    l2 = jax.tree_util.tree_leaves(reg.load("building"))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_loaded, l2)
    )
    # default aliases resolve to None (use the zoo default UNet)
    assert reg.load("通用") is None
    assert reg.load("default") is None
    assert reg.load(None) is None
    with pytest.raises(KeyError):
        reg.load("nonexistent")


def test_registry_discover_and_reference_aliases(two_checkpoints):
    ucfg, (d1, _), (d2, _), tmp_path = two_checkpoints
    reg = UNetRegistry(unet_config=ucfg, param_dtype=jnp.float32)
    reg.discover(str(tmp_path))
    names = reg.names()
    assert "landscape" in names and "building" in names
    # the reference UI names map onto the discovered slugs
    assert "景觀" in names and "建築" in names and "通用" in names
    assert reg.load("景觀") is reg.load("landscape")
    assert reg.load("建築") is reg.load("building")


def test_registry_rejects_mismatched_checkpoint(tmp_path):
    # checkpoint saved with a different architecture must fail validation
    import dataclasses

    ucfg, params = _tiny_unet_params(seed=3)
    # a VALID architecture that differs from the saved one (64 base
    # channels vs 32 — 16 would fail GroupNorm-32 at template init and
    # mask the validation path under test)
    other_cfg = dataclasses.replace(UNetConfig.tiny(64), model_channels=64)
    d = str(tmp_path / "bad")
    save_params(d, params)
    reg = UNetRegistry(unet_config=other_cfg, param_dtype=jnp.float32)
    reg.register("bad", d)
    # RuntimeError — the SAME strict-load gate zoo.load_or_init uses
    # (utils/checkpoint.load_validated_params), so the policy can't drift
    with pytest.raises(RuntimeError, match="does not match"):
        reg.load("bad")


# --------------------------------------------------------------------------
# HTTP surface
# --------------------------------------------------------------------------

def _post(srv, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
        return json.loads(r.read())


def test_server_model_type_selection(two_checkpoints):
    ucfg, (d1, _), (d2, _), _ = two_checkpoints
    reg = UNetRegistry(unet_config=ucfg, param_dtype=jnp.float32)
    reg.register("landscape", d1)
    reg.register("building", d2)

    calls = []

    def fake_guided(**kwargs):
        calls.append(kwargs)
        return {"seed": len(calls)}

    srv = ClipDiffusionServer(port=0, guided_fn=fake_guided, registry=reg)
    srv.start_background()
    try:
        assert set(_get(srv, "/model_types")["model_types"]) >= {
            "landscape", "building", "通用",
        }

        def run(body):
            code, out = _post(srv, "/guided_sample", body)
            for _ in range(100):
                if not srv.worker.busy:
                    break
                time.sleep(0.02)
            return code, out

        code, _ = run({"prompt": "a", "model_type": "landscape"})
        assert code == 200
        code, _ = run({"prompt": "b", "model_type": "building"})
        assert code == 200
        code, _ = run({"prompt": "c", "model_type": "通用"})
        assert code == 200
        code, _ = run({"prompt": "d"})
        assert code == 200
        code, out = _post(srv, "/guided_sample",
                          {"prompt": "e", "model_type": "nope"})
        assert code == 400 and "unknown model_type" in out["error"]

        # landscape vs building forwarded DIFFERENT param trees; default
        # and omitted model_type forwarded none
        assert "custom_model_params" in calls[0]
        assert "custom_model_params" in calls[1]
        la = jax.tree_util.tree_leaves(calls[0]["custom_model_params"])
        lb = jax.tree_util.tree_leaves(calls[1]["custom_model_params"])
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(la, lb)
        )
        assert "custom_model_params" not in calls[2]
        assert "custom_model_params" not in calls[3]
        # model_type never leaks through to the sampling fn
        assert all("model_type" not in c for c in calls)
    finally:
        srv.shutdown()


def test_server_answers_500_on_corrupt_checkpoint(two_checkpoints):
    # a registered checkpoint whose architecture mismatches the registry's
    # template raises ValueError at load time; the server must answer a
    # JSON 500 instead of dying mid-handler (connection reset)
    import dataclasses

    ucfg, (d1, _), _, _ = two_checkpoints
    other_cfg = dataclasses.replace(UNetConfig.tiny(64), model_channels=16)
    reg = UNetRegistry(unet_config=other_cfg, param_dtype=jnp.float32)
    reg.register("broken", d1)

    srv = ClipDiffusionServer(
        port=0, guided_fn=lambda **kw: {}, registry=reg
    )
    srv.start_background()
    try:
        code, out = _post(srv, "/guided_sample",
                          {"prompt": "x", "model_type": "broken"})
        assert code == 500
        assert "failed to load" in out["error"]
        # the server is still alive and serving after the failure
        assert set(_get(srv, "/model_types")["model_types"]) >= {"broken"}
    finally:
        srv.shutdown()


def test_server_500_on_internal_keyerror_not_400(two_checkpoints,
                                                 monkeypatch):
    """A KeyError raised while READING a registered checkpoint is a broken
    server asset (500), not a client error: only the dedicated
    UnknownModelType may map to 400."""
    ucfg, (d1, _), _, _ = two_checkpoints
    reg = UNetRegistry(unet_config=ucfg, param_dtype=jnp.float32)
    reg.register("landscape", d1)

    def broken_load(self, path):
        raise KeyError("missing subtree 'input_blocks_3'")

    monkeypatch.setattr(UNetRegistry, "_load_checkpoint", broken_load)
    srv = ClipDiffusionServer(port=0, guided_fn=lambda **kw: {}, registry=reg)
    srv.start_background()
    try:
        code, out = _post(srv, "/guided_sample",
                          {"prompt": "x", "model_type": "landscape"})
        assert code == 500
        assert "failed to load" in out["error"]
        # unknown names still answer 400
        code, out = _post(srv, "/guided_sample",
                          {"prompt": "x", "model_type": "nope"})
        assert code == 400 and "unknown model_type" in out["error"]
    finally:
        srv.shutdown()


def test_server_model_type_changes_images(two_checkpoints, tmp_path):
    """End-to-end: two registered tiny finetunes produce different images
    through the real guided sampling path (VERDICT r2 item 4 done-check)."""
    from clip_diffusion_tpu.models.clip import CLIP_PRESETS, tiny_clip_config
    from clip_diffusion_tpu.models.clip.model import CLIPModel
    from clip_diffusion_tpu.tests_support import tiny_config
    from clip_diffusion_tpu.zoo import ZooModels
    from clip_diffusion_tpu import sample as sample_mod

    ucfg, (d1, _), (d2, _), _ = two_checkpoints
    reg = UNetRegistry(unet_config=ucfg, param_dtype=jnp.float32)
    reg.register("landscape", d1)
    reg.register("building", d2)

    ccfg = tiny_clip_config(name="tiny-reg")
    clip = CLIPModel(ccfg)
    cparams = clip.init(
        jax.random.PRNGKey(7), jnp.ones((1, 32, 32, 3)),
        jnp.ones((1, 77), jnp.int32),
    )
    CLIP_PRESETS.setdefault("tiny-reg", ccfg)
    unet = UNetModel(ucfg)
    base_params = unet.init(
        jax.random.PRNGKey(9), jnp.ones((1, 64, 64, 3)), jnp.zeros((1,))
    )
    models = ZooModels(
        unet=unet, unet_params=base_params,
        clips={"tiny-reg": (clip, cparams)}, aesthetic={},
    )
    cfg = tiny_config(chosen_clip_models=("tiny-reg",))

    import functools

    guided = functools.partial(
        sample_mod.guided_diffusion_sample,
        models=models, steps=3, seed=11,
        output_dir=str(tmp_path / "out"),
    )
    srv = ClipDiffusionServer(
        port=0, config=cfg, guided_fn=guided, registry=reg
    )
    srv.start_background()
    try:
        imgs = {}
        for mt in ("landscape", "building"):
            code, _ = _post(srv, "/guided_sample",
                            {"prompt": "a test prompt", "model_type": mt})
            assert code == 200
            for _ in range(1200):
                if not srv.worker.busy:
                    break
                time.sleep(0.25)  # 1-core CI box: compile takes a while
            assert not srv.worker.busy, "guided sample did not finish"
            assert srv.worker.error is None, srv.worker.error
            from PIL import Image

            path = srv.worker.result["images"][0]
            imgs[mt] = np.asarray(Image.open(path))
        assert not np.array_equal(imgs["landscape"], imgs["building"])
        # the shared zoo default must NOT have been mutated by the custom
        # requests (dataclasses.replace copy in sample.py)
        assert models.unet_params is base_params
    finally:
        srv.shutdown()


def test_registry_concurrent_first_load_loads_once(two_checkpoints,
                                                   monkeypatch):
    """Concurrent first requests for one finetune must device_put ONE tree
    (a transient duplicate 552M tree can OOM the worker, STATUS.md)."""
    import threading

    ucfg, (d1, p1), _, _ = two_checkpoints
    reg = UNetRegistry(unet_config=ucfg, param_dtype=jnp.float32)
    reg.register("landscape", d1)

    calls = []
    real = UNetRegistry._load_checkpoint

    def slow_load(self, path):
        calls.append(path)
        time.sleep(0.2)  # widen the race window
        return real(self, path)

    monkeypatch.setattr(UNetRegistry, "_load_checkpoint", slow_load)
    results = [None] * 4

    def hit(i):
        results[i] = reg.load("landscape")

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1
    assert all(r is results[0] for r in results)
