"""Tiled (fold/unfold) first-stage inference for large images.

Capability parity with the reference's ``split_input_params`` path
(``model/lib/stable_diffusion/ldm/models/diffusion/ddpm.py``):

* ``get_fold_unfold`` / ``get_weighting`` / ``delta_border`` (:558-650):
  overlapping-patch extraction, border-distance patch weighting (clipped,
  optional tie-breaker over the patch grid), and overlap normalization.
* ``decode_first_stage`` split branch (:698-745): unfold latents at ``ks`` /
  ``stride``, decode each patch (upsampled by ``vqf``), weight, fold.
* ``encode_first_stage`` split branch (:817-849): unfold images, encode each
  patch (downsampled by ``vqf``), weight, fold.

It is off the CycleDiffusion configs' code path (only the reference's
superres notebook helper sets it, ``notebook_helpers.py:149-160``) but part
of the LatentDiffusion surface.

TPU-first design: the reference loops ``first_stage_model.decode`` over the
L patches in Python (:732-736) — one small kernel launch per patch.  Here
the L patches are folded into the BATCH axis and decoded in ONE call (the
MXU sees (B*L, ks, ks, C)), optionally micro-batched by the caller for
memory.  Unfold is static strided slicing, fold is a static scatter-add —
both trace to fixed-shape XLA ops (no dynamic shapes under jit).  The
border weighting depends only on static geometry, so it is computed on the
host with numpy once and closed over as a constant.

Layout is NHWC throughout (TPU conv layout); the reference is NCHW.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SplitInputParams:
    """Mirror of the reference's ``split_input_params`` dict
    (``notebook_helpers.py:153-160``)."""

    ks: Tuple[int, int] = (128, 128)
    stride: Tuple[int, int] = (64, 64)
    # First-stage spatial factor; None -> derived from the model's ch_mult
    # (the reference requires it explicitly, notebook_helpers.py:153-160)
    vqf: Optional[int] = None
    # Patch micro-batch for the per-patch first-stage call (None = all
    # B*L patches in one program); bound VAE memory at superres scale the
    # same way the candidate ensemble micro-batches its 512px decodes
    micro_batch: Optional[int] = None
    patch_distributed_vq: bool = True
    tie_braker: bool = False          # sic — reference key spelling
    clip_max_weight: float = 0.5
    clip_min_weight: float = 0.01
    clip_max_tie_weight: float = 0.5
    clip_min_tie_weight: float = 0.01


def _clip_geometry(hw: Tuple[int, int], ks, stride):
    """ks/stride reduced to the input extent (ddpm.py:712-719)."""
    h, w = hw
    ks = (min(ks[0], h), min(ks[1], w))
    stride = (min(stride[0], h), min(stride[1], w))
    return ks, stride


def _grid(hw: Tuple[int, int], ks, stride) -> Tuple[int, int]:
    """Patch-grid extents Ly, Lx (ddpm.py:603-604)."""
    return ((hw[0] - ks[0]) // stride[0] + 1,
            (hw[1] - ks[1]) // stride[1] + 1)


def delta_border(h: int, w: int) -> np.ndarray:
    """Normalized min distance to the border, 0 at edge, 0.5 at center
    (ddpm.py:565-577).  Returns (h, w) float64.  Size-1 dimensions count as
    all-edge (distance 0) rather than the reference's 0/0 NaN."""
    y = np.arange(h, dtype=np.float64)[:, None] / max(h - 1, 1)
    x = np.arange(w, dtype=np.float64)[None, :] / max(w - 1, 1)
    arr = np.stack(np.broadcast_arrays(y, x), axis=-1)      # (h, w, 2)
    dist_lu = arr.min(axis=-1)
    dist_rd = (1.0 - arr).min(axis=-1)
    return np.minimum(dist_lu, dist_rd)


def patch_weighting(ks: Tuple[int, int], Ly: int, Lx: int,
                    p: SplitInputParams) -> np.ndarray:
    """Per-pixel patch weighting, optionally tie-broken over the grid
    (ddpm.py:579-594).  Returns (Ly*Lx, ks0, ks1) float32."""
    w = np.clip(delta_border(*ks), p.clip_min_weight, p.clip_max_weight)
    w = np.broadcast_to(w[None], (Ly * Lx,) + tuple(ks)).copy()
    if p.tie_braker:
        lw = np.clip(delta_border(Ly, Lx),
                     p.clip_min_tie_weight, p.clip_max_tie_weight)
        w = w * lw.reshape(Ly * Lx, 1, 1)
    return w.astype(np.float32)


def unfold_nhwc(x: jnp.ndarray, ks, stride) -> jnp.ndarray:
    """(B, H, W, C) -> (B, Ly*Lx, ks0, ks1, C), row-major patch order
    (torch.nn.Unfold's L ordering, ddpm.py:608-609)."""
    Ly, Lx = _grid(x.shape[1:3], ks, stride)
    patches = [
        x[:, iy * stride[0]: iy * stride[0] + ks[0],
          ix * stride[1]: ix * stride[1] + ks[1], :]
        for iy in range(Ly) for ix in range(Lx)
    ]
    return jnp.stack(patches, axis=1)


def fold_nhwc(patches: jnp.ndarray, out_hw: Tuple[int, int],
              stride) -> jnp.ndarray:
    """(B, L, ks0, ks1, C) -> (B, H, W, C) by overlap-add
    (torch.nn.Fold semantics, ddpm.py:611)."""
    b, n, k0, k1, c = patches.shape
    Ly, Lx = _grid(out_hw, (k0, k1), stride)
    assert n == Ly * Lx, (n, Ly, Lx)
    out = jnp.zeros((b, out_hw[0], out_hw[1], c), patches.dtype)
    i = 0
    for iy in range(Ly):
        for ix in range(Lx):
            out = out.at[:, iy * stride[0]: iy * stride[0] + k0,
                         ix * stride[1]: ix * stride[1] + k1, :].add(
                patches[:, i])
            i += 1
    return out


def fold_normalization(out_hw: Tuple[int, int], ks, stride,
                       weighting: np.ndarray) -> np.ndarray:
    """Folded weighting = per-pixel normalizer (ddpm.py:614,621,631).
    Returns (H, W) float32, computed on the host."""
    Ly, Lx = _grid(out_hw, ks, stride)
    out = np.zeros(out_hw, np.float32)
    i = 0
    for iy in range(Ly):
        for ix in range(Lx):
            out[iy * stride[0]: iy * stride[0] + ks[0],
                ix * stride[1]: ix * stride[1] + ks[1]] += weighting[i]
            i += 1
    return out


def split_first_stage_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    p: SplitInputParams,
    *,
    scale: int,
    upsample: bool,
    micro_batch: Optional[int] = None,
) -> jnp.ndarray:
    """Tiled apply of a per-patch first-stage ``fn`` with overlap blending.

    ``fn`` maps (N, ks0, ks1, C) -> (N, ks0*f, ks1*f, C') where f = ``scale``
    if ``upsample`` (decode, ddpm.py:698-745) else 1/``scale`` (encode,
    :817-849).  All patches ride the batch axis in one call (micro-batched
    in slices of ``micro_batch`` patches if set).
    """
    b = x.shape[0]
    ks, stride = _clip_geometry(x.shape[1:3], p.ks, p.stride)
    Ly, Lx = _grid(x.shape[1:3], ks, stride)
    L = Ly * Lx
    # the patch grid must cover the input exactly, or the uncovered strip's
    # fold normalizer is zero and the division below emits silent NaNs (the
    # reference has the same failure mode; here it is a loud precondition)
    assert ks[0] + (Ly - 1) * stride[0] == x.shape[1], (
        "patch grid does not cover input height", x.shape[1], ks[0], stride[0])
    assert ks[1] + (Lx - 1) * stride[1] == x.shape[2], (
        "patch grid does not cover input width", x.shape[2], ks[1], stride[1])

    if upsample:
        oks = (ks[0] * scale, ks[1] * scale)
        ostride = (stride[0] * scale, stride[1] * scale)
        out_hw = (x.shape[1] * scale, x.shape[2] * scale)
    else:
        assert all(k % scale == 0 and s % scale == 0
                   for k, s in zip(ks, stride)), (ks, stride, scale)
        oks = (ks[0] // scale, ks[1] // scale)
        ostride = (stride[0] // scale, stride[1] // scale)
        out_hw = (x.shape[1] // scale, x.shape[2] // scale)

    patches = unfold_nhwc(x, ks, stride)                 # (B, L, k, k, C)
    flat = patches.reshape((b * L,) + patches.shape[2:])
    if micro_batch is None:
        micro_batch = p.micro_batch
    if micro_batch is None or micro_batch >= b * L:
        dec = fn(flat)
    else:
        # pad the tail chunk to micro_batch so fn is traced/compiled at ONE
        # shape (a ragged remainder would force a second multi-minute
        # first-stage compile through a remote-compile setup)
        mb = micro_batch
        n = flat.shape[0]
        pad = (-n) % mb
        if pad:
            flat = jnp.concatenate([flat, flat[:pad]], axis=0)
        dec = jnp.concatenate(
            [fn(flat[i: i + mb]) for i in range(0, n + pad, mb)], axis=0)[:n]
    dec = dec.reshape((b, L) + dec.shape[1:])            # (B, L, ok, ok, C')

    w = patch_weighting(oks, Ly, Lx, p)                  # (L, ok0, ok1)
    norm = fold_normalization(out_hw, oks, ostride, w)   # (H', W')
    # blend in fp32 and round ONCE at the end: overlap bands accumulate up
    # to 4 weighted contributions, and bf16 accumulation would leave a
    # seam-aligned ~2^-8 error profile the reference's fp32 fold lacks
    out_dtype = dec.dtype
    dec = dec.astype(jnp.float32) * jnp.asarray(w)[None, :, :, :, None]
    out = fold_nhwc(dec, out_hw, ostride)
    return (out / jnp.asarray(norm)[None, :, :, None]).astype(out_dtype)
