"""3DGS training losses: L1 + SSIM.

Reference: the Inria trainer's ``l1_loss + lambda_dssim * (1 - ssim)`` with
lambda_dssim = 0.2 (gs_utils.py:96) and the fused-ssim CUDA kernel
(SURVEY.md §2.3 row 3).  TPU-native SSIM: the 11x11 gaussian window runs as
two separable depthwise convolutions — XLA fuses these; no custom kernel
needed (the convs map straight onto the MXU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_WINDOW = 11
_SIGMA = 1.5
C1 = 0.01 ** 2
C2 = 0.03 ** 2


def _gaussian_kernel():
    x = jnp.arange(_WINDOW, dtype=jnp.float32) - (_WINDOW - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * _SIGMA ** 2))
    return g / g.sum()


def _blur(img):
    """Separable 11x11 gaussian blur; img (H, W, C)."""
    g = _gaussian_kernel()
    # depthwise conv via vmap over channels, 1D convs over rows then cols
    def conv1d(x, axis):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (_WINDOW // 2, _WINDOW // 2)
        xp = jnp.pad(x, pad, mode="edge")
        return jax.vmap(
            lambda row: jnp.convolve(row, g, mode="valid"),
            in_axes=1 - axis, out_axes=1 - axis)(xp)

    def per_channel(c):
        return conv1d(conv1d(c, 0), 1)

    return jax.vmap(per_channel, in_axes=2, out_axes=2)(img)


def ssim(img1, img2):
    """Mean SSIM over an (H, W, C) pair in [0, 1]."""
    mu1 = _blur(img1)
    mu2 = _blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1) - mu1_sq
    sigma2_sq = _blur(img2 * img2) - mu2_sq
    sigma12 = _blur(img1 * img2) - mu12
    s = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(s)


def l1_loss(img1, img2):
    return jnp.mean(jnp.abs(img1 - img2))


def gs_loss(render, target, lambda_dssim: float = 0.2):
    """(1 - l) * L1 + l * (1 - SSIM); gs_utils.py:96 default l = 0.2."""
    return ((1.0 - lambda_dssim) * l1_loss(render, target)
            + lambda_dssim * (1.0 - ssim(render, target)))


def psnr(img1, img2):
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
