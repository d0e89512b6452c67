"""Image quality metrics: PSNR and SSIM.

Replaces the reference's kornia dependency (models/metrics.py): PSNR is
closed-form; SSIM is implemented as a window-3 mean filter (matching kornia's
``ssim(..., window_size=3)`` with C1=(0.01)^2, C2=(0.03)^2 on [0,1] images),
expressed as depthwise convolutions that XLA fuses on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """-10 log10(mse) (reference models/metrics.py:12-13)."""
    return -10.0 * jnp.log10(mse(pred, target))


def _avg_pool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 mean filter with 'valid' padding over (B, C, H, W)."""
    w = jnp.ones((1, 1, 3, 3), x.dtype) / 9.0
    c = x.shape[1]
    w = jnp.tile(w, (c, 1, 1, 1))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )


def ssim(pred: jnp.ndarray, target: jnp.ndarray, c1: float = 0.01 ** 2,
         c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Mean SSIM over (B, C, H, W) images in [0, 1], window size 3.

    Note: the reference reports ``mean(dssim)`` where dssim = (1 - ssim)/2
    (models/metrics.py:15-22 — despite the name, val logs 'ssim' as that
    dissimilarity). We return the *actual* mean SSIM; use :func:`dssim` for
    bug-compatible numbers.
    """
    mu_p = _avg_pool3(pred)
    mu_t = _avg_pool3(target)
    mu_pp = _avg_pool3(pred * pred)
    mu_tt = _avg_pool3(target * target)
    mu_pt = _avg_pool3(pred * target)
    var_p = mu_pp - mu_p * mu_p
    var_t = mu_tt - mu_t * mu_t
    cov = mu_pt - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)


def dssim(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """(1 - ssim) / 2 in [0, 1] — what the reference's 'ssim' metric logs."""
    return (1.0 - ssim(pred, target)) / 2.0
