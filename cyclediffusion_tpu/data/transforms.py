"""Host-side image transforms (PIL decode -> float32 HWC [0,1]).

Parity with the torchvision chains used by the preprocessors:
``CenterCropLongEdge`` (``utils/transform_utils.py:4-22``), Resize
(bilinear antialiased, torchvision semantics), ToTensor -> here a float
HWC array.  ``pil_loader`` / ``list_image_files_recursively`` parity with
``utils/file_utils.py:17-34`` (without the blobfile dependency).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
from PIL import Image

_EXTS = ("jpg", "jpeg", "png", "gif")


def pil_loader(path: str) -> Image.Image:
    with open(path, "rb") as f:
        img = Image.open(f)
        return img.convert("RGB")


def list_image_files_recursively(data_dir: str) -> List[str]:
    results: List[str] = []
    for entry in sorted(os.listdir(data_dir)):
        full_path = os.path.join(data_dir, entry)
        ext = entry.split(".")[-1]
        if "." in entry and ext.lower() in _EXTS:
            results.append(full_path)
        elif os.path.isdir(full_path):
            results.extend(list_image_files_recursively(full_path))
    return results


def center_crop_long_edge(img: Image.Image) -> Image.Image:
    """Square center crop to the SHORT edge (reference CenterCropLongEdge)."""
    w, h = img.size
    size = min(w, h)
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def resize(img: Image.Image, size: int, interpolation: str = "bilinear"
           ) -> Image.Image:
    """torchvision-style Resize: scale the SHORT edge to ``size``."""
    method = {
        "bilinear": Image.BILINEAR,
        "bicubic": Image.BICUBIC,
        "nearest": Image.NEAREST,
        "lanczos": Image.LANCZOS,
    }[interpolation]
    w, h = img.size
    if w <= h:
        new = (size, int(round(h * size / w)))
    else:
        new = (int(round(w * size / h)), size)
    return img.resize(new, method)


def to_array(img: Image.Image) -> np.ndarray:
    """PIL -> float32 HWC in [0,1] (ToTensor without the CHW transpose)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def data_root() -> str:
    return os.environ.get("CYCLEDIFFUSION_DATA_ROOT", ".")
