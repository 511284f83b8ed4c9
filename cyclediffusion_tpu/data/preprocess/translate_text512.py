"""Zero-shot text-editing triplets at 512px (SD v1.4 task).

Parity: ``preprocess/translate_text512.py`` — reads
``data/translate-text.json`` (list of {encode_text, decode_text, img_path}),
CenterCropLongEdge -> Resize(512) -> [0,1]; items carry
``model_kwargs = [sample_id, encode_text, decode_text, original_image]``;
the ``[raw_data] range`` slice selects the shard.
"""

from __future__ import annotations

import json

from cyclediffusion_tpu.data.preprocess.common import (
    ListDataset,
    PreprocessorBase,
    resolve_path,
    sample_id,
)
from cyclediffusion_tpu.data.transforms import (
    center_crop_long_edge,
    pil_loader,
    resize,
    to_array,
)

RESOLUTION = 512


class Preprocessor(PreprocessorBase):
    resolution = RESOLUTION

    def build_dev(self):
        raw = json.load(open(resolve_path("data/translate-text.json")))
        start, end = self.meta_args.raw_data.range
        res = self.resolution

        def getter(data):
            img = pil_loader(resolve_path(data["meta"]["img_path"]))
            img = to_array(resize(center_crop_long_edge(img), res))
            data["encode_text"] = data["meta"]["encode_text"]
            data["decode_text"] = data["meta"]["decode_text"]
            data["original_image"] = img
            data["model_kwargs"] = data["model_kwargs"] + [
                "encode_text", "decode_text", "original_image",
            ]
            return data

        items = [
            {
                "sample_id": sample_id(idx),
                "meta": meta,
                "model_kwargs": ["sample_id"],
            }
            for idx, meta in enumerate(raw[start:end])
        ]
        return ListDataset(items, getter)
