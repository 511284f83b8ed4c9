"""Unit coverage for multi-task dataset helpers and the grid visualizer."""

import os

import numpy as np

from cyclediffusion_tpu.data.preprocess.to_model import (
    MultiTaskDataset,
    SplitArgpathWrapper,
    StrideWrapper,
    upsample,
)
from cyclediffusion_tpu.runtime.config import Args
from cyclediffusion_tpu.visualization.multi_image import Visualizer, _make_grid


class _DS(list):
    pass


def _items(n, name="t"):
    return [
        {"sample_id": i, "model_kwargs": ["sample_id"], "payload": name}
        for i in range(n)
    ]


def test_upsample_weights():
    data = _items(4)
    out = upsample(data, 2.5)
    assert len(out) == 4 * 2 + 2  # floor(2.5)=2 copies + 0.5*4 residual
    # deep copies, not aliases
    out[0]["sample_id"] = 999
    assert data[0]["sample_id"] == 0


def test_stride_and_split_wrappers():
    ds = _DS(_items(10))
    strided = StrideWrapper(ds, 3)
    assert len(strided) == 3
    assert strided[1]["sample_id"] == 3

    tagged = SplitArgpathWrapper(ds, "dev", "mytask")
    item = tagged[0]
    assert item["split"] == "dev" and item["name"] == "mytask"


def test_multi_task_dataset_eval_num_stride_and_projection():
    meta = Args(raw_data=Args(upsample_temp=1, eval_num=3))
    ds = MultiTaskDataset(meta, {"a": _DS(_items(9, "a"))}, split="dev")
    assert len(ds) == 3
    # __getitem__ projects to model_kwargs only
    assert set(ds[0].keys()) == {"sample_id"}
    # underlying items keep split/name tags for the evaluator
    assert ds.data[0]["name"] == "a" and ds.data[0]["split"] == "dev"
    assert [d["sample_id"] for d in ds.data] == [0, 3, 6]


def test_make_grid_dimensions():
    imgs = np.zeros((10, 16, 16, 3), np.float32)
    grid = _make_grid(imgs, nrows=8, pad=2)
    # 10 images, 8 per row -> 2 rows
    assert grid.shape == (2 * 18 + 2, 8 * 18 + 2, 3)


def test_visualizer_writes_grids(tmp_path):
    vis = Visualizer(args=None)
    orig = np.random.RandomState(0).rand(3, 16, 16, 3).astype(np.float32)
    trans = np.random.RandomState(1).rand(3, 16, 16, 3).astype(np.float32)
    vis.visualize((orig, trans), model=None, description="eval",
                  save_dir=str(tmp_path), step=7)
    files = sorted(os.listdir(tmp_path))
    assert "eval_000007.png" in files
    assert "eval_256_000007.png" in files


def test_visualizer_upscales_third_set(tmp_path):
    vis = Visualizer(args=None)
    a = np.zeros((2, 16, 16, 3), np.float32)
    b = np.zeros((2, 16, 16, 3), np.float32)
    c = np.zeros((2, 8, 8, 3), np.float32)  # lower-res aux set
    vis.visualize((a, b, c), model=None, description="aux",
                  save_dir=str(tmp_path), step=0)
    assert "aux_000000.png" in os.listdir(tmp_path)
