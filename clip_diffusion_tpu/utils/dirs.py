"""Directory utilities (reference utils/dir_utils.py:1-51)."""

from __future__ import annotations

import glob
import os
import shutil

OUTPUT_PATH = "output_images"
MODEL_PATH = "models"


def make_dir(path: str, remove_old: bool = False) -> str:
    """mkdir -p, optionally clearing previous contents (reference
    dir_utils.py:28-39)."""
    if remove_old and os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path


def list_images(folder: str, extension: str = "png"):
    """Sorted glob of images under a folder (reference dir_utils.py:42-51)."""
    return sorted(glob.glob(os.path.join(folder, f"*.{extension}")))
