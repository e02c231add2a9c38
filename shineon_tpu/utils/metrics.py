"""SSIM / PSNR implementations compatible with the skimage calls the reference
makes (calculate_metrics.py:102-107: ``structural_similarity(..., data_range=
gen.max()-gen.min(), multichannel=True)`` and ``peak_signal_noise_ratio``).

skimage's defaults reproduced: 7x7 uniform filter, K1=0.01, K2=0.03, sample
covariance normalization (N/(N-1)), per-channel SSIM averaged for multichannel.
Implemented with scipy.ndimage (skimage itself is not in this environment).
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter


def structural_similarity(
    im1: np.ndarray,
    im2: np.ndarray,
    data_range: float | None = None,
    multichannel: bool = False,
    win_size: int = 7,
    K1: float = 0.01,
    K2: float = 0.03,
) -> float:
    """SSIM between two images (H, W) or (H, W, C) with multichannel=True."""
    im1 = np.asarray(im1, np.float64)
    im2 = np.asarray(im2, np.float64)
    if im1.shape != im2.shape:
        raise ValueError(f"shape mismatch: {im1.shape} vs {im2.shape}")
    if multichannel or (im1.ndim == 3 and im1.shape[-1] in (3, 4)):
        return float(
            np.mean([
                structural_similarity(
                    im1[..., c], im2[..., c], data_range=data_range,
                    multichannel=False, win_size=win_size, K1=K1, K2=K2,
                )
                for c in range(im1.shape[-1])
            ])
        )
    if data_range is None:
        data_range = im1.max() - im1.min()
    if data_range == 0:
        data_range = 1.0

    ndim = im1.ndim
    NP = win_size ** ndim
    cov_norm = NP / (NP - 1)  # sample covariance (skimage default)

    def f(x):
        return uniform_filter(x, size=win_size)

    ux = f(im1)
    uy = f(im2)
    uxx = f(im1 * im1)
    uyy = f(im2 * im2)
    uxy = f(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    R = data_range
    C1 = (K1 * R) ** 2
    C2 = (K2 * R) ** 2
    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux ** 2 + uy ** 2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    # crop the filter's edge effects, like skimage
    pad = (win_size - 1) // 2
    crop = tuple(slice(pad, s - pad) for s in S.shape)
    return float(S[crop].mean())


def peak_signal_noise_ratio(
    image_true: np.ndarray, image_test: np.ndarray, data_range: float | None = None
) -> float:
    image_true = np.asarray(image_true, np.float64)
    image_test = np.asarray(image_test, np.float64)
    if data_range is None:
        data_range = image_true.max() - image_true.min()
    mse = np.mean((image_true - image_test) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10((data_range ** 2) / mse))


def mean_squared_error(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
