"""Image-quality metrics in pure jnp: PSNR, SSIM, binary IoU.

Equivalents of the torchmetrics stack at
/root/reference/crop_nerf/fruit_nerf/fruit_nerf.py:181-183,672-700
(PeakSignalNoiseRatio, structural_similarity_index_measure, JaccardIndex).
LPIPS (a VGG-feature metric) is eval-only in the reference and is provided
separately/optionally — it needs ported conv weights, not a kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """SSIM with an 11x11 Gaussian window (torchmetrics defaults).

    pred/target: [H, W, C] in [0, data_range].
    """
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = _gaussian_kernel(kernel_size, sigma)[None, None]         # [1,1,k,k]

    # NCHW conv, channels as batch for a depthwise effect.
    def filt(img):
        x = jnp.transpose(img, (2, 0, 1))[:, None]                  # [C,1,H,W]
        y = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID")
        return y[:, 0]                                              # [C,h,w]

    mu_p, mu_t = filt(pred), filt(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sig_p = filt(pred * pred) - mu_pp
    sig_t = filt(target * target) - mu_tt
    sig_pt = filt(pred * target) - mu_pt
    num = (2 * mu_pt + c1) * (2 * sig_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sig_p + sig_t + c2)
    return jnp.mean(num / den)


def binary_iou(pred: jnp.ndarray, target: jnp.ndarray,
               threshold: float = 0.5) -> jnp.ndarray:
    """Jaccard index on {0,1} masks after thresholding probabilities
    (fruit_nerf.py:696-700 uses JaccardIndex(task='binary') on the sigmoid
    semantic map vs fruit_mask)."""
    p = (pred >= threshold).astype(jnp.float32)
    t = (target >= threshold).astype(jnp.float32)
    inter = jnp.sum(p * t)
    union = jnp.sum(jnp.maximum(p, t))
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0),
                     jnp.array(1.0, jnp.float32))
