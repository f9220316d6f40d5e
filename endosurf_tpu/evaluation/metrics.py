"""Image-quality metrics: masked PSNR / RMSE / SSIM / LPIPS.

Numerics match the reference metric stack (/root/reference/src/trainer/
utils.py:340-502): PSNR and RMSE normalize by the mask sum; SSIM is the
windowed (11, sigma=1.5) Gaussian variant computed on mask-multiplied images
with valid-only convolution; LPIPS is VGG16-based and requires converted
pretrained weights (see endosurf_tpu/evaluation/lpips_jax.py — gated because
this environment has no network egress to fetch them).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def cal_psnr(a, b, mask) -> float:
    """Masked PSNR (reference trainer/utils.py:340-353)."""
    a, b, mask = np.asarray(a), np.asarray(b), np.asarray(mask)
    if mask.ndim == a.ndim - 1:
        mask = mask[..., None]
    mask_sum = mask.sum() + 1e-10
    mse = ((a - b) ** 2 * mask).sum() / (mask_sum * 3.0)
    return float(20.0 * np.log10(1.0 / np.sqrt(mse)))


def cal_rmse(a, b, mask) -> float:
    """Masked RMSE (reference trainer/utils.py:356-369)."""
    a, b, mask = np.asarray(a), np.asarray(b), np.asarray(mask)
    if mask.ndim == a.ndim - 1:
        mask = mask[..., None]
    mask_sum = mask.sum() + 1e-10
    return float((((a - b) ** 2 * mask).sum() / mask_sum) ** 0.5)


def _gaussian_window(w_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(w_size) - w_size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _conv2d_grouped(x: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """Per-channel valid conv. x: [B,C,H,W], kern: [k,k]."""
    c = x.shape[1]
    k = jnp.broadcast_to(kern[None, None], (c, 1, *kern.shape))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
        precision="highest")


def cal_ssim(a, b, mask) -> float:
    """Masked windowed SSIM matching the reference class (utils.py:373-457).

    Images are multiplied by the mask first, then standard SSIM with an
    11x11 sigma-1.5 Gaussian window, valid padding, L=1.
    """
    a = jnp.asarray(np.asarray(a), jnp.float32)
    b = jnp.asarray(np.asarray(b), jnp.float32)
    m = jnp.asarray(np.asarray(mask), jnp.float32)
    if m.ndim == a.ndim - 1:
        m = m[..., None]
    a = (a * m).transpose(0, 3, 1, 2)   # [B,C,H,W]
    b = (b * m).transpose(0, 3, 1, 2)
    kern = jnp.asarray(_gaussian_window())

    mu1 = _conv2d_grouped(a, kern)
    mu2 = _conv2d_grouped(b, kern)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _conv2d_grouped(a * a, kern) - mu1_sq
    sigma2_sq = _conv2d_grouped(b * b, kern) - mu2_sq
    sigma12 = _conv2d_grouped(a * b, kern) - mu1_mu2

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    v1 = 2.0 * sigma12 + C2
    v2 = sigma1_sq + sigma2_sq + C2
    ssim_map = ((2 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    return float(jnp.mean(ssim_map))


def cal_lpips(a, b, mask, batch: int = 2) -> Optional[float]:
    """Masked LPIPS (VGG). Returns None when pretrained weights are absent."""
    try:
        from endosurf_tpu.evaluation.lpips_jax import lpips_fn
    except Exception:
        return None
    fn = lpips_fn()
    if fn is None:
        return None
    a, b, mask = np.asarray(a), np.asarray(b), np.asarray(mask)
    if mask.ndim == a.ndim - 1:
        mask = mask[..., None]
    a = a * mask
    b = b * mask
    vals = []
    for i in range(0, a.shape[0], batch):
        vals.append(fn(jnp.asarray(a[i:i + batch]), jnp.asarray(b[i:i + batch])))
    return float(np.mean([np.asarray(v).mean() for v in vals]))
