import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from clip_diffusion_tpu.utils.dirs import list_images, make_dir
from clip_diffusion_tpu.utils.image_io import array_to_image
from clip_diffusion_tpu.utils.profiling import Stopwatch, trace


def test_make_dir_remove_old(tmp_path):
    d = str(tmp_path / "out")
    make_dir(d)
    open(os.path.join(d, "stale.txt"), "w").write("x")
    make_dir(d, remove_old=True)
    assert os.path.isdir(d)
    assert not os.listdir(d)


def test_list_images(tmp_path):
    d = str(tmp_path)
    for name in ("b.png", "a.png", "c.jpg"):
        array_to_image(np.zeros((2, 2, 3), np.float32)).save(
            os.path.join(d, name)
        )
    imgs = list_images(d)
    assert [os.path.basename(p) for p in imgs] == ["a.png", "b.png"]


def test_stopwatch():
    sw = Stopwatch()
    with sw.section("a"):
        pass
    rep = json.loads(sw.report())
    assert "a" in rep


def test_trace_noop():
    with trace(None):
        x = jnp.ones(3) + 1
    assert float(x.sum()) == 6.0


def test_super_resolution_folder(tmp_path):
    from clip_diffusion_tpu.models.esrgan import (
        RRDBNet,
        super_resolution_folder,
    )

    model = RRDBNet(num_feat=8, num_block=1, num_grow_ch=4, scale=4)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 3)))
    folder = str(tmp_path)
    for i in range(3):
        array_to_image(
            np.random.default_rng(i).uniform(0, 1, (8, 8, 3))
        ).save(os.path.join(folder, f"latent_{i}.png"))
    grid = os.path.join(folder, "latent_grid_image.png")
    array_to_image(np.zeros((8, 8, 3), np.float32)).save(grid)

    written = super_resolution_folder(model, params, folder,
                                      exception_paths=[grid])
    assert len(written) == 3  # grid excluded
    from PIL import Image

    with Image.open(written[0]) as im:
        assert im.size == (32, 32)


def test_task_state_contract():
    """The Anvil task-state key/value contract (reference
    functional.py:177-179; keys at sample.py:95,280-311)."""
    from clip_diffusion_tpu.utils.progress import TaskState

    st = TaskState()
    for key, val in (("new_prompt", "p"), ("current_batch", 0),
                     ("current_step", 5), ("current_result", "url"),
                     ("current_iteration", 2)):
        st.store(key, val)
    snap = st.snapshot()
    assert snap["current_step"] == 5 and snap["new_prompt"] == "p"
    assert st.get("missing", "dflt") == "dflt"
    # snapshot is a copy, not a live view
    snap["current_step"] = 99
    assert st.get("current_step") == 5


def test_default_uploader_env_gating(tmp_path, monkeypatch):
    """Cloud uploaders are opt-in via the reference's env vars and degrade
    to local when the deps/creds are absent (the reference hard-requires
    them at import, image_utils.py:16-22)."""
    from clip_diffusion_tpu.utils.progress import (
        LocalUploader,
        default_uploader,
    )

    for var in ("FIREBASE_CREDENTIAL_PATH", "FIREBASE_STORAGE_URL",
                "IMGUR_CLIENT_ID"):
        monkeypatch.delenv(var, raising=False)
    up = default_uploader(str(tmp_path))
    assert isinstance(up, LocalUploader)
    # creds set but firebase_admin/pyimgur unimportable -> graceful local
    monkeypatch.setenv("FIREBASE_CREDENTIAL_PATH", "/nope.json")
    monkeypatch.setenv("FIREBASE_STORAGE_URL", "gs://nope")
    monkeypatch.setenv("IMGUR_CLIENT_ID", "nope")
    assert isinstance(default_uploader(str(tmp_path)), LocalUploader)

    src = tmp_path / "img.png"
    array_to_image(np.zeros((2, 2, 3), np.float32)).save(str(src))
    url = up.upload(str(src))
    assert os.path.exists(url.replace("file://", ""))


def test_step_timer():
    from clip_diffusion_tpu.utils.progress import StepTimer

    t = StepTimer()
    t.tick(5)
    assert t.steps == 5
    assert t.per_step >= 0.0
