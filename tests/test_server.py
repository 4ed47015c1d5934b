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
