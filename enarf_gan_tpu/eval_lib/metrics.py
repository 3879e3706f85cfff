"""Image metrics: PSNR / SSIM / (optional) LPIPS.

PSNR matches reference libraries/metrics.py:14-16 (images in [-1, 1]:
20·log10(2) − 10·log10(mse)). SSIM is a faithful port of
skimage.structural_similarity defaults as the reference calls it
(metrics.py:8-11: [0,1] images, data_range=1, uniform 7x7 window,
multichannel averaged). LPIPS is architecture-complete but requires
externally supplied pretrained weights (no network egress); see
``lpips_available``.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def mse(img1: np.ndarray, img2: np.ndarray) -> float:
    return float(np.mean((np.asarray(img1, np.float64)
                          - np.asarray(img2, np.float64)) ** 2))


def psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """Images in [-1, 1] (reference metrics.py:14-16)."""
    m = mse(img1, img2)
    return float(20 * np.log10(2) - 10 * np.log10(m))


def _ssim_single(im1: np.ndarray, im2: np.ndarray, data_range: float,
                 win_size: int = 7, K1: float = 0.01, K2: float = 0.03) -> float:
    from scipy.ndimage import uniform_filter
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)
    ux = uniform_filter(im1, win_size)
    uy = uniform_filter(im2, win_size)
    uxx = uniform_filter(im1 * im1, win_size)
    uyy = uniform_filter(im2 * im2, win_size)
    uxy = uniform_filter(im1 * im2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / \
        ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    pad = (win_size - 1) // 2
    return float(S[pad:-pad, pad:-pad].mean())


def ssim(img1: np.ndarray, img2: np.ndarray, data_range: float = 1.0) -> float:
    """SSIM over (C, H, W) or (H, W) images; multichannel = channel average.

    Callers pass [-1,1] images; like the reference (metrics.py:9-10) we map
    to [0,1] when data_range == 1.
    """
    img1 = np.asarray(img1)
    img2 = np.asarray(img2)
    if img1.ndim == 4:  # (1, C, H, W)
        img1, img2 = img1[0], img2[0]
    if data_range == 1.0:
        img1 = img1 * 0.5 + 0.5
        img2 = img2 * 0.5 + 0.5
    if img1.ndim == 2:
        return _ssim_single(img1, img2, data_range)
    return float(np.mean([_ssim_single(img1[c], img2[c], data_range)
                          for c in range(img1.shape[0])]))


# ------------------------------- LPIPS --------------------------------- #

_LPIPS_CACHE = {}


def lpips_available(weights_path: Optional[str] = None) -> bool:
    import os
    path = weights_path or os.environ.get("LPIPS_WEIGHTS_NPZ", "")
    return bool(path) and os.path.exists(path)


def lpips(img1: np.ndarray, img2: np.ndarray,
          weights_path: Optional[str] = None) -> float:
    """LPIPS distance with externally supplied VGG/Alex weights (.npz).

    The npz must hold conv weights of the backbone plus per-layer linear
    weights, as produced by data_preprocess/export_lpips_weights.py (requires
    the `lpips` pip package at export time, run on a connected machine).
    """
    import os
    path = weights_path or os.environ.get("LPIPS_WEIGHTS_NPZ", "")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "LPIPS weights not available; export them with "
            "data_preprocess/export_lpips_weights.py and set LPIPS_WEIGHTS_NPZ")
    from enarf_gan_tpu.eval_lib.lpips_jax import lpips_distance
    return lpips_distance(np.asarray(img1), np.asarray(img2), path)
