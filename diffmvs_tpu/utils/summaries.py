"""Image summaries (the reference's save_images, utils.py:82-101).

Writes normalized PNG grids to logdir/images/ and, when tensorboardX is
available, TB image summaries — headless-friendly, no torchvision.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
from PIL import Image


def _normalize(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.float32)
    lo, hi = float(img.min()), float(img.max())
    if hi - lo < 1e-12:
        return np.zeros_like(img, dtype=np.uint8)
    return ((img - lo) / (hi - lo) * 255).astype(np.uint8)


def save_images(logdir: str, mode: str, images: Dict[str, np.ndarray],
                step: int, tb=None) -> None:
    """images: {name: [B, H, W] or [B, H, W, C]}; saves the first sample."""
    outdir = os.path.join(logdir, "images")
    os.makedirs(outdir, exist_ok=True)
    for name, value in images.items():
        img = np.asarray(value)
        if img.ndim == 4:
            img = img[0]
        elif img.ndim == 3 and img.shape[0] not in (1, 3):
            img = img[0]
        img = _normalize(np.squeeze(img))
        Image.fromarray(img).save(
            os.path.join(outdir, f"{mode}_{name}_{step:08d}.png"))
        if tb is not None:
            arr = img[None] if img.ndim == 2 else img.transpose(2, 0, 1)
            tb.add_image(f"{mode}/{name}", arr, step)
