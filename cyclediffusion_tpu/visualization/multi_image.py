"""Image-grid visualizer: interleave (original, translated[, aux]) rows.

Parity: ``visualization/multi_image.py:9-64`` — stacks k image sets
per-sample, nearest-upsamples mismatched third sets, caps at 100*k tiles,
writes ``{description}_{step:06d}.png`` (8 per row) plus a bicubic 256px copy
``{description}_256_{step:06d}.png``.  Images are float HWC [0,1] numpy.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def _to_pil(arr: np.ndarray) -> Image.Image:
    return Image.fromarray(
        np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    )


def _make_grid(images: np.ndarray, nrows: int = 8, pad: int = 2) -> np.ndarray:
    """(N,H,W,C) -> grid array (torchvision make_grid semantics)."""
    n, h, w, c = images.shape
    ncols = nrows  # torchvision's nrow = images per row
    nrow_count = (n + ncols - 1) // ncols
    grid = np.zeros(
        (nrow_count * (h + pad) + pad, ncols * (w + pad) + pad, c),
        dtype=np.float32,
    )
    for idx in range(n):
        r, col = divmod(idx, ncols)
        y = r * (h + pad) + pad
        x = col * (w + pad) + pad
        grid[y : y + h, x : x + w] = images[idx]
    return grid


def save_images(images: np.ndarray, output_dir: str, file_prefix: str,
                nrows: int, iteration: int) -> None:
    grid = _make_grid(np.asarray(images), nrows)
    path = os.path.join(
        output_dir, f"{file_prefix}_{str(iteration).zfill(6)}.png"
    )
    _to_pil(grid).save(path)


class Visualizer:
    def __init__(self, args):
        self.args = args

    def visualize(self, images, model, description: str, save_dir: str,
                  step: int) -> None:
        k = len(images)
        assert k >= 2
        images = [np.asarray(im) for im in images]
        bsz, h, w, c = images[0].shape
        if k == 3:
            b2, h2, w2, c2 = images[2].shape
            assert bsz == b2 and c == c2 and h2 == w2 and h == w
            if h2 != h:
                assert h2 < h
                scale = h // h2
                images = (
                    images[0],
                    images[1],
                    np.repeat(np.repeat(images[2], scale, 1), scale, 2),
                )
        merged = np.stack(images, axis=1).reshape(bsz * k, h, w, c)
        merged = merged[: 100 * k]

        os.makedirs(save_dir, exist_ok=True)
        save_images(merged, save_dir, description, nrows=8, iteration=step)

        # bicubic 256px copy
        small = np.stack(
            [
                np.asarray(
                    _to_pil(im).resize((256, 256), Image.BICUBIC),
                    dtype=np.float32,
                ) / 255.0
                for im in merged
            ]
        )
        save_images(small, save_dir, f"{description}_256", nrows=8,
                    iteration=step)
