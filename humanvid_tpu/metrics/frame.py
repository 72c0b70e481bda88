"""Frame quality metrics: SSIM, PSNR, L1 (pure JAX, batched).

Behavioral parity: reference ``metrics/utils/loss_utils.py:33`` (SSIM with an
11x11 Gaussian window, sigma 1.5, C1=0.01^2, C2=0.03^2 on [0,1] images) and
``metrics/utils/image_utils.py:17`` (PSNR from per-image MSE). Used by
``scripts/eval_pose2img.py:267-272`` and ``metrics/metrics.py:89-147``.

Images are NHWC float in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM per batch element. img: (n, h, w, c) in [0, 1]."""
    w2d = _gaussian_window(window_size)
    c = img1.shape[-1]
    # depthwise conv: (kh, kw, 1, c) with feature_group_count=c
    kernel = jnp.asarray(np.tile(w2d[:, :, None, None], (1, 1, 1, c)))
    pad = window_size // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean(axis=(1, 2, 3))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-batch-element PSNR in dB; images in [0, 1]."""
    mse = ((img1 - img2) ** 2).mean(axis=(1, 2, 3))
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def l1(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(img1 - img2).mean(axis=(1, 2, 3))
