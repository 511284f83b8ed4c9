"""Native LPIPS (Learned Perceptual Image Patch Similarity) in Flax.

The driver-set fidelity bound for this rebuild is "<1e-2 LPIPS drift vs the
PyTorch reference under fixed seeds" (BASELINE.md).  The reference repo itself
only carries LPIPS inside vendored, dead training losses
(``model/lib/*/ldm/modules/losses/contperceptual.py``); the canonical metric
is the ``lpips`` pip package (Zhang et al. 2018, VGG16 backbone).  This module
owns that tower natively, like the repo owns CLIP:

* :class:`VGG16Features` — the five LPIPS taps (relu1_2, relu2_2, relu3_3,
  relu4_3, relu5_3) of a torchvision-layout VGG16, NHWC.
* :func:`lpips_distance` — input scaling, per-tap channel-unit-normalize,
  squared difference, learned 1x1 linear heads, spatial mean, sum over taps —
  matching lpips/lpips.py ``LPIPS.forward`` exactly.
* Weights are a user asset (``CYCLEDIFFUSION_LPIPS`` -> torch state_dict of
  the lpips package's ``LPIPS(net='vgg')`` module) converted by
  ``convert/lpips_import.py``.  Without the asset,
  :func:`random_lpips_params` gives a deterministic random-feature metric:
  still a valid *drift* detector (random VGG features separate images), but
  its absolute scale is not the published LPIPS scale.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# conv widths per tap stage (torchvision VGG16 features, maxpool between)
VGG16_STAGES: Tuple[Tuple[int, ...], ...] = (
    (64, 64),
    (128, 128),
    (256, 256, 256),
    (512, 512, 512),
    (512, 512, 512),
)

# lpips/lpips.py ScalingLayer constants (shift/scale for [-1,1] inputs)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 conv tower returning the five LPIPS tap activations.

    Input: NHWC, already scaled by the LPIPS ScalingLayer.  Max-pool 2x2
    between stages (after each tap), ReLU after every conv — the exact
    torchvision ``vgg16().features`` slicing used by lpips.
    """

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        conv_idx = 0
        for stage, widths in enumerate(VGG16_STAGES):
            if stage > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for w in widths:
                x = nn.Conv(w, (3, 3), padding="SAME", name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
            taps.append(x)
        return taps


def _unit_normalize(feat, eps=1e-10):
    """lpips.normalize_tensor: unit L2 norm over the channel axis."""
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / (norm + eps)


def scaling_layer(img):
    """Map [-1,1] RGB (NHWC) to VGG input space (lpips ScalingLayer)."""
    shift = jnp.asarray(_SHIFT, img.dtype)
    scale = jnp.asarray(_SCALE, img.dtype)
    return (img - shift) / scale


def lpips_distance(params, img0, img1):
    """LPIPS(img0, img1); images NHWC RGB in [-1, 1].  Returns (B,).

    ``params`` is a dict with keys ``vgg`` (VGG16Features params) and
    ``lins`` (list of 5 (C,) non-negative 1x1 head weights).
    """
    h, w = img0.shape[1:3]
    if h < 16 or w < 16:
        raise ValueError(
            f"LPIPS needs inputs >= 16x16 (four 2x2 max-pools); got {h}x{w}")
    tower = VGG16Features()
    f0 = tower.apply(params["vgg"], scaling_layer(img0))
    f1 = tower.apply(params["vgg"], scaling_layer(img1))
    total = 0.0
    for tap, (a, b) in enumerate(zip(f0, f1)):
        diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        w = jnp.asarray(params["lins"][tap], diff.dtype)
        # 1x1 conv head == channel-weighted sum; then spatial mean
        val = jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
        total = total + val
    return total


def random_lpips_params(key=None, image_size: int = 64):
    """Deterministic random-feature LPIPS params (assetless drift metric).

    Heads are |N(0,1)|/C so the metric's scale is stable across taps.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    tower = VGG16Features()
    x = jnp.zeros((1, image_size, image_size, 3))
    vgg = tower.init(key, x)
    lins = []
    widths = [s[-1] for s in VGG16_STAGES]
    for i, c in enumerate(widths):
        k = jax.random.fold_in(key, 1000 + i)
        lins.append(jnp.abs(jax.random.normal(k, (c,))) / c)
    return {"vgg": vgg, "lins": lins}


def load_lpips_params(path: str | None = None):
    """Load LPIPS weights from the user asset, or None if unavailable.

    ``path`` defaults to ``$CYCLEDIFFUSION_LPIPS`` (a torch-saved state_dict
    of ``lpips.LPIPS(net='vgg')``).
    """
    path = path or os.environ.get("CYCLEDIFFUSION_LPIPS")
    if not path or not os.path.exists(path):
        return None
    from cyclediffusion_tpu.convert.lpips_import import convert_lpips
    from cyclediffusion_tpu.convert.torch_import import load_torch_state_dict

    return convert_lpips(load_torch_state_dict(path))
