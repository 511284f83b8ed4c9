"""The shipped translate-text benchmark data loads through the preprocessor."""

import os

import numpy as np

from cyclediffusion_tpu.runtime.config import Args, get_config
from cyclediffusion_tpu.runtime.registry import get_preprocessor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_translate_text512_dataset(monkeypatch):
    monkeypatch.setenv("CYCLEDIFFUSION_DATA_ROOT", REPO)
    task_args = get_config("tasks/translate_text512.cfg")
    meta_args = Args(raw_data=Args(range=[0, 4], upsample_temp=1))
    pre = get_preprocessor(task_args.preprocess.preprocess_program)(
        task_args, meta_args
    )
    splits = pre.preprocess(
        {"train": [], "validation": [], "test": []}, cache_root="/tmp"
    )
    dev = splits["dev"]
    assert len(dev) == 4
    item = dev[0]
    assert item["encode_text"].startswith("A black bear")
    assert "walking in the grass next to red flowers" in item["decode_text"]
    img = item["original_image"]
    assert img.shape == (512, 512, 3)
    assert img.dtype == np.float32
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0
    assert set(item["model_kwargs"]) == {
        "sample_id", "encode_text", "decode_text", "original_image",
    }


def test_translate_text256_resolution(monkeypatch):
    monkeypatch.setenv("CYCLEDIFFUSION_DATA_ROOT", REPO)
    task_args = get_config("tasks/translate_text256.cfg")
    meta_args = Args(raw_data=Args(range=[5, 7], upsample_temp=1))
    pre = get_preprocessor(task_args.preprocess.preprocess_program)(
        task_args, meta_args
    )
    dev = pre.preprocess(
        {"train": [], "validation": [], "test": []}, cache_root="/tmp"
    )["dev"]
    assert len(dev) == 2
    assert dev[0]["original_image"].shape == (256, 256, 3)
