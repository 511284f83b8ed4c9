"""Tiny synthetic text-editing triplets (smoke tests / benches, no assets).

Four deterministic 32x32 images with toy text pairs; same item schema as
``translate_text512``.
"""

from __future__ import annotations

import numpy as np

from cyclediffusion_tpu.data.preprocess.common import (
    ListDataset,
    PreprocessorBase,
    sample_id,
)

PAIRS = [
    ("a photo of a cat", "a photo of a dog"),
    ("a red car", "a blue car"),
    ("a winter scene", "a summer scene"),
    ("an old house", "a new house"),
]


class Preprocessor(PreprocessorBase):
    resolution = 32

    def build_dev(self):
        res = self.resolution
        rng_range = getattr(self.meta_args.raw_data, "range", None) or [0, 4]
        start, end = rng_range

        def getter(data):
            rng = np.random.RandomState(int(data["sample_id"]))
            img = rng.uniform(0, 1, size=(res, res, 3)).astype(np.float32)
            enc, dec = PAIRS[int(data["sample_id"]) % len(PAIRS)]
            data["encode_text"] = enc
            data["decode_text"] = dec
            data["original_image"] = img
            data["model_kwargs"] = data["model_kwargs"] + [
                "encode_text", "decode_text", "original_image",
            ]
            return data

        items = [
            {"sample_id": sample_id(idx), "model_kwargs": ["sample_id"]}
            for idx in range(start, end)
        ]
        return ListDataset(items, getter)
