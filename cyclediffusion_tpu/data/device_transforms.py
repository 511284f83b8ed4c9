"""Jitted on-device image preprocessing (BASELINE.md north star: the
(image, src_text, tgt_text) batch streams end-to-end on TPU).

The host PIL path (`data/transforms.py`) remains the bit-parity reference
(PIL's resampling kernels differ slightly); this path decodes once on host
and does center-crop + antialiased resize + normalization on device, batched
and fused into the consuming jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("size", "method"))
def preprocess_batch(images: jnp.ndarray, size: int, method: str = "bilinear"
                     ) -> jnp.ndarray:
    """(B, H, W, C) uint8 or float -> (B, size, size, C) float32 in [0,1].

    Center-crops the long edge to square (CenterCropLongEdge semantics),
    then antialiased-resizes to ``size``.
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    images = images.astype(jnp.float32)
    b, h, w, c = images.shape
    s = min(h, w)
    top = (h - s) // 2
    left = (w - s) // 2
    cropped = jax.lax.dynamic_slice(
        images, (0, top, left, 0), (b, s, s, c)
    )
    out = jax.image.resize(
        cropped, (b, size, size, c), method=method, antialias=size < s
    )
    return jnp.clip(out, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("size",))
def to_model_space(images01: jnp.ndarray, size: int) -> jnp.ndarray:
    """[0,1] batch -> [-1,1] at the model resolution (the wrappers' first
    normalization step, e.g. stable_diffusion wrapper :178-180)."""
    images01 = preprocess_batch(images01, size)
    return (images01 - 0.5) * 2.0
