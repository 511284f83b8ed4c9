"""Native FID / KID computation with a pluggable feature extractor.

The reference delegates to the ``clean-fid`` package
(``evaluation/translate_to_dog.py:81-88``), which downloads an InceptionV3
from the network.  This environment has no egress, so the statistics pipeline
(Frechet distance over Gaussian moments; polynomial-kernel MMD for KID with
clean-fid's defaults) is implemented here over features from either

* an InceptionV3 torchscript/pt asset (``CYCLEDIFFUSION_INCEPTION_CKPT``),
  matching clean-fid numerically, or
* the shared CLIP image tower (documented deviation, logged loudly), or
* raw 64-d image moments as a last-resort smoke metric for tiny tests.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Optional

import numpy as np

logger = logging.getLogger(__name__)

# converted Inception params + jitted feature fn, keyed by ckpt path
# (rebuilt only when the asset path changes)
_INCEPTION_CACHE: dict = {}


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FID between two Gaussians (standard Heusel et al. formulation)."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        # near-singular product (small eval sets): retry with a jitter on
        # the diagonals, exactly as pytorch-fid/clean-fid do — otherwise the
        # NaN silently propagates into the saved metrics
        eps = 1e-6
        logger.warning(
            "fid sqrtm produced non-finite values; retrying with eps=%g", eps)
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = scipy.linalg.sqrtm(
            (sigma1 + offset) @ (sigma2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def compute_fid_from_features(feat1: np.ndarray, feat2: np.ndarray) -> float:
    mu1, mu2 = feat1.mean(0), feat2.mean(0)
    s1 = np.cov(feat1, rowvar=False)
    s2 = np.cov(feat2, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)


def compute_kid_from_features(
    feat1: np.ndarray, feat2: np.ndarray, num_subsets: int = 100,
    max_subset_size: int = 1000, seed: int = 0,
) -> float:
    """Polynomial-kernel MMD^2 estimate (clean-fid defaults)."""
    n = feat1.shape[1]
    m = min(min(feat1.shape[0], feat2.shape[0]), max_subset_size)
    rng = np.random.RandomState(seed)
    t = 0.0
    for _ in range(num_subsets):
        x = feat2[rng.choice(feat2.shape[0], m, replace=False)]
        y = feat1[rng.choice(feat1.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


# --------------------------------------------------------------------------- #
# feature extractors
# --------------------------------------------------------------------------- #


def _moment_features(images: np.ndarray) -> np.ndarray:
    """(B,H,W,C) [0,1] -> (B, 64) patch-moment features (smoke metric only)."""
    b, h, w, c = images.shape
    gh, gw = 4, 4
    ph, pw = h // gh, w // gw
    x = images[:, : ph * gh, : pw * gw]
    x = x.reshape(b, gh, ph, gw, pw, c)
    means = x.mean(axis=(2, 4))                      # (B, gh, gw, C)
    stds = x.std(axis=(2, 4))
    feats = np.concatenate(
        [means.reshape(b, -1), stds.reshape(b, -1)], axis=1
    )
    return feats.astype(np.float64)[:, :64]


def _clip_features(images: np.ndarray) -> Optional[np.ndarray]:
    from cyclediffusion_tpu.runtime.context import get_directional_clip

    dclip = get_directional_clip(required=False)
    if dclip is None:
        return None
    import jax.numpy as jnp

    out = []
    for i in range(0, images.shape[0], 32):
        out.append(np.asarray(
            dclip.scorer.embed_image(jnp.asarray(images[i:i + 32]))
        ))
    return np.concatenate(out, axis=0).astype(np.float64)


def _resize_299_bicubic(images: np.ndarray) -> np.ndarray:
    """clean-fid's resize: PIL bicubic to 299x299 on FLOAT data.

    clean-fid's "clean" mode resizes float32 PIL images (mode 'F', one
    channel at a time) precisely to avoid a uint8 round-trip — quantizing
    first shifts pool3 features systematically (clean-fid README; their
    resizer build_resizer('clean')/make_resizer PIL-float path)."""
    if images.shape[1:3] == (299, 299):
        return images
    try:
        from PIL import Image

        out = np.empty((images.shape[0], 299, 299, 3), np.float32)
        for i, img in enumerate(images):
            arr = np.asarray(img, np.float32) * 255.0
            for ch in range(3):
                out[i, :, :, ch] = np.asarray(
                    Image.fromarray(arr[:, :, ch], mode="F").resize(
                        (299, 299), Image.BICUBIC),
                    np.float32,
                )
        return out / 255.0
    except ImportError:
        import jax
        import jax.numpy as jnp

        resized = jax.image.resize(
            jnp.asarray(images), (images.shape[0], 299, 299, 3), "cubic"
        )
        return np.clip(np.asarray(resized), 0.0, 1.0)


def _inception_features(images: np.ndarray) -> Optional[np.ndarray]:
    """pool3 features from the native Flax tower (preferred) or a
    torchscript asset (legacy fallback).  Parity:
    ``/root/reference/evaluation/translate_to_dog.py:81-88`` (clean-fid's
    InceptionV3)."""
    path = os.environ.get("CYCLEDIFFUSION_INCEPTION_CKPT")
    if not path or not os.path.exists(path):
        return None

    # native path: a pytorch-fid state_dict asset, converted + run in Flax.
    # The conversion (a ~100MB torch.load + BN fold) is cached per path —
    # compute_fid_kid calls this twice per eval round, every round.
    if _INCEPTION_CACHE.get("path") == path:
        params = _INCEPTION_CACHE["params"]
    else:
        try:
            from cyclediffusion_tpu.convert.inception_import import convert_inception
            from cyclediffusion_tpu.convert.torch_import import load_torch_state_dict

            params = convert_inception(load_torch_state_dict(path))
        except Exception as e:  # noqa: BLE001 — fall back to torchscript, loudly
            import warnings

            warnings.warn(
                f"native Inception conversion failed ({type(e).__name__}: {e}); "
                f"trying torch.jit.load({path!r}) as a torchscript archive"
            )
            params = None
        _INCEPTION_CACHE["path"] = path
        _INCEPTION_CACHE["params"] = params

    if params is not None:
        import jax
        import jax.numpy as jnp

        from cyclediffusion_tpu.models.inception import inception_pool3_features

        feat_fn = _INCEPTION_CACHE.get("feat_fn")
        if feat_fn is None:
            feat_fn = jax.jit(inception_pool3_features)
            _INCEPTION_CACHE["feat_fn"] = feat_fn
        resized = _resize_299_bicubic(images)
        out = []
        for i in range(0, resized.shape[0], 32):
            batch = resized[i:i + 32]
            pad = 0
            if batch.shape[0] < 32 and resized.shape[0] > 32:
                pad = 32 - batch.shape[0]  # avoid a second compile
                batch = np.concatenate([batch, batch[-1:].repeat(pad, 0)])
            feats = np.asarray(feat_fn(params, jnp.asarray(batch)))
            if pad:
                feats = feats[:-pad]
            out.append(feats)
        return np.concatenate(out, axis=0).astype(np.float64)

    # legacy: torchscript archive with its own resize+normalize graph
    import torch

    model = torch.jit.load(path).eval()
    out = []
    with torch.no_grad():
        for i in range(0, images.shape[0], 32):
            batch = torch.from_numpy(
                np.transpose(images[i:i + 32], (0, 3, 1, 2))
            ).float()
            feats = model(batch * 255.0)
            out.append(feats.numpy())
    return np.concatenate(out, axis=0).astype(np.float64)


def get_feature_extractor() -> Callable[[np.ndarray], np.ndarray]:
    """Best available extractor, with loud logging about fidelity.

    The returned callable carries a ``.kind`` attribute naming the feature
    backend actually used on the last call (``"inception"`` — clean-fid
    comparable — or the ``"clip"`` / ``"moment"`` fallbacks), so metric keys
    can be tagged and asset-less numbers can never be mistaken for clean-fid.
    """

    def extract(images: np.ndarray) -> np.ndarray:
        feats = _inception_features(images)
        if feats is not None:
            extract.kind = "inception"
            return feats
        feats = _clip_features(images)
        if feats is not None:
            extract.kind = "clip"
            logger.warning(
                "FID/KID computed over CLIP features (no inception asset) — "
                "values are NOT comparable to clean-fid numbers."
            )
            return feats
        extract.kind = "moment"
        logger.warning(
            "FID/KID computed over raw patch moments (no feature assets) — "
            "smoke-test fidelity only."
        )
        return _moment_features(images)

    extract.kind = None
    return extract


def compute_fid_kid(gen_images: np.ndarray, ref_images: np.ndarray):
    """(Bg,H,W,C), (Br,H,W,C) in [0,1] -> (fid, kid, feature_kind).

    ``feature_kind`` is ``"inception"`` (clean-fid comparable) or the
    ``"clip"`` / ``"moment"`` fallback used when no asset is available.
    """
    extract = get_feature_extractor()
    f_gen = extract(gen_images)
    f_ref = extract(ref_images)
    return (
        compute_fid_from_features(f_gen, f_ref),
        compute_kid_from_features(f_gen, f_ref),
        extract.kind,
    )
