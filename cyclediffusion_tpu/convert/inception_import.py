"""Convert pytorch-fid InceptionV3 weights to the Flax BN-folded layout.

Source: the standard ``pt_inception-2015-12-05-*.pth`` state_dict (pytorch-fid
/ clean-fid asset; torchvision key naming: ``Mixed_5b.branch1x1.conv.weight``,
``....bn.{weight,bias,running_mean,running_var}``, stem ``Conv2d_1a_3x3.*``).

BatchNorm (eps=1e-3, affine) is folded into each conv:
``k' = k * gamma / sqrt(var + eps)``, ``b' = beta - gamma * mean / sqrt(...)``
(convs are bias-free in the source).  The ``fc`` head is dropped — FID uses
pool3 features only.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_BN_EPS = 1e-3


def convert_inception(sd: Dict[str, np.ndarray]) -> dict:
    modules = {}
    for key in sd:
        if key.endswith(".conv.weight"):
            modules[key[: -len(".conv.weight")]] = None
    tree: dict = {}
    for mod in modules:
        w = np.asarray(sd[f"{mod}.conv.weight"], np.float32)  # (O,I,kh,kw)
        gamma = np.asarray(sd[f"{mod}.bn.weight"], np.float32)
        beta = np.asarray(sd[f"{mod}.bn.bias"], np.float32)
        mean = np.asarray(sd[f"{mod}.bn.running_mean"], np.float32)
        var = np.asarray(sd[f"{mod}.bn.running_var"], np.float32)
        scale = gamma / np.sqrt(var + _BN_EPS)
        kernel = np.transpose(w, (2, 3, 1, 0)) * scale  # HWIO, scale on O
        bias = beta - mean * scale
        node = tree
        for part in mod.split("."):
            node = node.setdefault(part, {})
        node["conv"] = {"kernel": kernel, "bias": bias}
    assert "Conv2d_1a_3x3" in tree and "Mixed_7c" in tree, sorted(tree)
    return {"params": tree}
