"""AFHQ test-split cats, 512 -> 256 bilinear (unpaired translation source).

Parity: ``preprocess/afhqcat256.py`` — files from
``./stargan-v2/data/test/cat`` (recursive, sorted), asserted 512x512,
bilinear resize to 256; ``model_kwargs = [sample_id, original_image]``.
"""

from __future__ import annotations

from cyclediffusion_tpu.data.preprocess.common import (
    ListDataset,
    PreprocessorBase,
    resolve_path,
    sample_id,
)
from cyclediffusion_tpu.data.transforms import (
    list_image_files_recursively,
    pil_loader,
    resize,
    to_array,
)

ROOT = "stargan-v2/data/test/cat"
INTERPOLATION = "bilinear"


class Preprocessor(PreprocessorBase):
    root = ROOT

    def build_dev(self):
        files = list_image_files_recursively(resolve_path(self.root))

        def getter(data):
            img = pil_loader(data["file_name"])
            assert img.size == (512, 512)
            data["original_image"] = to_array(resize(img, 256, INTERPOLATION))
            data["model_kwargs"] = data["model_kwargs"] + ["original_image"]
            return data

        items = [
            {
                "sample_id": sample_id(idx),
                "file_name": fn,
                "model_kwargs": ["sample_id"],
            }
            for idx, fn in enumerate(files)
        ]
        return ListDataset(items, getter)
