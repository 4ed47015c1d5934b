"""Image I/O: array<->PIL, trajectory GIFs, grids with drawn indices.

Covers the reference's image utilities (reference utils/image_utils.py:
35-73,117-130 and utils/functional.py:182-198): range conversion, the
6-frame trajectory GIF (5 evenly spaced + final), grid assembly for the
latent pipeline, and index labels drawn onto grid cells.

Arrays are NHWC float; [-1,1] model space or [0,1] display space.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image, ImageDraw, ImageFont


def normalize_image_neg_one_to_one(x):
    """[0,1] -> [-1,1] (reference image_utils.py:35-38)."""
    return x * 2.0 - 1.0


def denormalize_image_zero_to_one(x):
    """[-1,1] -> [0,1] (reference image_utils.py:40-42)."""
    return (x + 1.0) / 2.0


def array_to_image(arr) -> Image.Image:
    """(H,W,3) float [0,1] -> PIL RGB (reference tensor_to_pillow_image)."""
    arr = np.asarray(arr)
    arr = np.clip(arr, 0.0, 1.0)
    return Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8))


def image_to_array(image: Image.Image) -> np.ndarray:
    """PIL -> (H,W,3) float32 [0,1]."""
    return np.asarray(image.convert("RGB"), dtype=np.float32) / 255.0


def load_image(path_or_bytes, size=None) -> np.ndarray:
    """Open + optional LANCZOS resize -> [0,1] array (reference
    preprocessing.py:27-41 uses the same resample filter)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        import io

        img = Image.open(io.BytesIO(path_or_bytes))
    else:
        img = Image.open(path_or_bytes)
    img = img.convert("RGB")
    if size is not None:
        img = img.resize(size, Image.LANCZOS)
    return image_to_array(img)


def load_mask(path_or_bytes, size=None) -> np.ndarray:
    """Binarized mask on a white background (Anvil images arrive with alpha;
    reference preprocessing.py:44-58) -> (H,W,1) float 0/1."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        import io

        mask = Image.open(io.BytesIO(path_or_bytes))
    else:
        mask = Image.open(path_or_bytes)
    background = Image.new("RGB", mask.size, "WHITE")
    if mask.mode in ("RGBA", "LA", "PA"):
        background.paste(mask, box=(0, 0), mask=mask)
    else:
        background.paste(mask, box=(0, 0))
    mask = background.convert("1")
    if size is not None:
        mask = mask.resize(size, Image.LANCZOS)
    arr = np.asarray(mask, dtype=np.float32)
    return arr[..., None]


def create_gif(
    frames: Sequence[np.ndarray] | np.ndarray,
    path: str,
    duration_ms: int = 500,
) -> str:
    """Write a trajectory GIF.  The reference samples 5 evenly spaced
    per-step PNGs plus the final frame (reference image_utils.py:45-73);
    here the sampler already returns exactly the evenly-spaced frame stack
    (pipeline/guided.guided_sample)."""
    frames = [array_to_image(f) for f in np.asarray(frames)]
    frames[0].save(
        path,
        save_all=True,
        append_images=frames[1:],
        duration=max(duration_ms // max(len(frames), 1), 20),
        loop=0,
    )
    return path


def make_grid(images: np.ndarray, nrow: int, padding: int = 2) -> np.ndarray:
    """(N,H,W,3) [0,1] -> one grid image, row-major, torchvision-make_grid
    semantics (reference sample.py:441-443)."""
    n, h, w, c = images.shape
    ncol = nrow
    nrows = int(np.ceil(n / ncol))
    grid = np.zeros(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c),
        dtype=images.dtype,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[i]
    return grid


def _font(size: int):
    path = os.environ.get("CLIP_DIFFUSION_FONT")
    if path and os.path.exists(path):
        return ImageFont.truetype(path, size)
    try:
        return ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", size
        )
    except Exception:
        return ImageFont.load_default()


def draw_index_on_grid_image(
    grid_image: Image.Image,
    num_rows: int,
    num_cols: int,
    cell_height: int,
    cell_width: int,
    padding: int = 2,
) -> Image.Image:
    """Draw the cell index in each grid cell's corner (reference
    functional.py:182-198 draws with a bundled font; any TTF works —
    override via $CLIP_DIFFUSION_FONT)."""
    draw = ImageDraw.Draw(grid_image)
    font = _font(max(cell_height // 8, 10))
    idx = 0
    for r in range(num_rows):
        for c in range(num_cols):
            x = c * (cell_width + padding) + padding + 4
            y = r * (cell_height + padding) + padding + 2
            draw.text((x, y), str(idx), fill=(255, 64, 64), font=font)
            idx += 1
    return grid_image
