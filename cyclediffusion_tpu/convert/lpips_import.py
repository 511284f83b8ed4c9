"""Convert the ``lpips`` pip package's VGG16 LPIPS weights to Flax params.

Source layout (``lpips.LPIPS(net='vgg')`` state_dict):

* ``net.slice{1..5}.{idx}.weight/bias`` — torchvision ``vgg16().features``
  conv layers, sliced at the five LPIPS taps.  The torchvision feature
  indices of the 13 convs are fixed: (0,2), (5,7), (10,12,14), (17,19,21),
  (24,26,28).
* ``lin{0..4}.model.1.weight`` — non-negative 1x1 conv heads, shape
  (1, C, 1, 1).

Target: the ``{"vgg": ..., "lins": [...]}'' params consumed by
``evaluation/lpips.py::lpips_distance`` (NHWC Flax convs ``conv_0..conv_12``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from cyclediffusion_tpu.convert.torch_import import _conv_kernel

# torchvision vgg16().features indices of each conv, grouped by LPIPS slice
_SLICE_CONV_IDX = (
    (0, 2),
    (5, 7),
    (10, 12, 14),
    (17, 19, 21),
    (24, 26, 28),
)


def convert_lpips(sd: Dict[str, np.ndarray]) -> dict:
    convs = {}
    flat_conv = 0
    for s, idxs in enumerate(_SLICE_CONV_IDX, start=1):
        for idx in idxs:
            w = sd[f"net.slice{s}.{idx}.weight"]
            b = sd[f"net.slice{s}.{idx}.bias"]
            convs[f"conv_{flat_conv}"] = {
                "kernel": _conv_kernel(w),
                "bias": b,
            }
            flat_conv += 1
    assert flat_conv == 13, flat_conv
    lins = []
    for i in range(5):
        w = sd[f"lin{i}.model.1.weight"]  # (1, C, 1, 1)
        assert w.ndim == 4 and w.shape[0] == 1 and w.shape[2:] == (1, 1), w.shape
        lins.append(w[0, :, 0, 0])
    return {"vgg": {"params": convs}, "lins": lins}
