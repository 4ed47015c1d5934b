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
