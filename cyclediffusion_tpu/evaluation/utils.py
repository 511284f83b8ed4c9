"""Metric primitives (parity: ``evaluation/utils.py``).

Images are float HWC numpy: PSNR/L2 on [0,1] arrays, SSIM MATLAB-style on
[0,255] with an 11x11 sigma-1.5 Gaussian window and valid cropping.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in this image
    cv2 = None


def save_image(image_path: str, image: np.ndarray) -> None:
    """float HWC [0,1] -> PNG."""
    assert image.ndim == 3 and image.shape[2] == 3, image.shape
    arr = np.clip(np.asarray(image) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(image_path)


def _gaussian_window():
    if cv2 is not None:
        kernel = cv2.getGaussianKernel(11, 1.5)
    else:
        x = np.arange(11) - 5.0
        kernel = np.exp(-(x**2) / (2 * 1.5**2))[:, None]
        kernel /= kernel.sum()
    return np.outer(kernel, kernel.T)


def _filter2d(img: np.ndarray, window: np.ndarray) -> np.ndarray:
    if cv2 is not None:
        return cv2.filter2D(img, -1, window)
    from scipy.ndimage import correlate

    return correlate(img, window, mode="reflect")


def ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    assert img1.shape == img2.shape and img1.ndim == 2
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    window = _gaussian_window()
    mu1 = _filter2d(img1, window)[5:-5, 5:-5]
    mu2 = _filter2d(img2, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _filter2d(img1**2, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = _filter2d(img2**2, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = _filter2d(img1 * img2, window)[5:-5, 5:-5] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return float(ssim_map.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """MATLAB-style SSIM on [0,255] HWC (or HW) arrays."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2:
        return ssim(img1, img2)
    if img1.ndim == 3:
        if img1.shape[2] == 3:
            return float(np.mean([ssim(img1[:, :, i], img2[:, :, i])
                                  for i in range(3)]))
        if img1.shape[2] == 1:
            return ssim(np.squeeze(img1), np.squeeze(img2))
    raise ValueError("Wrong input image dimensions.")


def calculate_psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """PSNR on [0,1] HWC arrays (100 dB at exact match)."""
    assert img1.shape == img2.shape
    assert (img1 >= 0).all() and (img1 <= 1).all()
    assert (img2 >= 0).all() and (img2 <= 1).all()
    mse = float(((img1 - img2) ** 2).mean())
    if mse == 0:
        return 100.0
    return float(10 * np.log10(1.0 / mse))


def calculate_l2(img1: np.ndarray, img2: np.ndarray) -> float:
    """sqrt of the summed squared difference (translate_text.py:86-89)."""
    return float(np.sqrt(((img1 - img2) ** 2).sum()))


def ensure_empty_dir(path: str) -> None:
    if os.path.exists(path):
        if os.path.isfile(path):
            os.remove(path)
        else:
            for f in os.listdir(path):
                os.remove(os.path.join(path, f))
    os.makedirs(path, exist_ok=True)
