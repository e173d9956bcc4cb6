"""Gaussian-window SSIM, matching the vendored pohsun_ssim implementation
(/root/reference/external/pohsun_ssim/pytorch_ssim/__init__.py:7-73):
11×11 Gaussian window (σ=1.5), per-channel depthwise convolution with
SAME padding, C1=0.01², C2=0.03², mean over all pixels.

TPU notes: the separable Gaussian is expressed as two 1-D depthwise convs —
XLA maps these to small fused convolutions; cheaper than the dense 11×11.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian(window_size, sigma, dtype):
    x = jnp.arange(window_size, dtype=dtype) - window_size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _blur(img, window):
    """Separable depthwise Gaussian blur, SAME padding. img [B,C,H,W]."""
    B, C, H, W = img.shape
    k = window.shape[0]
    wrow = window.reshape(1, 1, 1, k)
    wcol = window.reshape(1, 1, k, 1)
    dn = jax.lax.conv_dimension_numbers(img.shape, (1, 1, 1, k),
                                        ("NCHW", "OIHW", "NCHW"))
    out = img.reshape(B * C, 1, H, W)
    out = jax.lax.conv_general_dilated(out, wrow, (1, 1), "SAME",
                                       dimension_numbers=dn)
    out = jax.lax.conv_general_dilated(out, wcol, (1, 1), "SAME",
                                       dimension_numbers=dn)
    return out.reshape(B, C, H, W)


def ssim(img1, img2, window_size=11, sigma=1.5, size_average=True):
    """img1/img2 [B,C,H,W] in [0,1] → scalar (or [B] if not size_average)."""
    window = _gaussian(window_size, sigma, img1.dtype)
    mu1 = _blur(img1, window)
    mu2 = _blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window) - mu2_sq
    sigma12 = _blur(img1 * img2, window) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / \
               ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))
