"""Image metrics (parity with /root/reference/metrics.py).

``ssim`` is implemented natively (gaussian-window SSIM equivalent to kornia's
``ssim`` used at metrics.py:14-20) rather than depending on kornia.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(image_pred, image_gt, valid_mask=None, reduction: str = 'mean'):
    value = (image_pred - image_gt) ** 2
    if valid_mask is not None:
        value = jnp.where(valid_mask, value, 0.0)
        if reduction == 'mean':
            return jnp.sum(value) / jnp.maximum(jnp.sum(valid_mask), 1)
    if reduction == 'mean':
        return jnp.mean(value)
    return value


def psnr(image_pred, image_gt, valid_mask=None, reduction: str = 'mean'):
    return -10.0 * jnp.log10(mse(image_pred, image_gt, valid_mask, reduction))


def _gaussian_kernel(window_size: int, sigma: float):
    x = jnp.arange(window_size, dtype=jnp.float32) - (window_size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def ssim(image_pred, image_gt, window_size: int = 3, sigma: float = 1.5,
         max_val: float = 1.0):
    """Structural similarity between (H, W, C) images in [0, max_val].

    Gaussian-window SSIM (window 3, sigma 1.5), matching kornia's defaults as
    used by the reference. Returns the mean SSIM in [-1, 1].
    """
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    kernel = _gaussian_kernel(window_size, sigma)

    def blur(img):
        # Separable gaussian blur over H and W for each channel.
        def conv1d(x, axis):
            x = jnp.moveaxis(x, axis, -1)
            pad = window_size // 2
            xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
                         mode='edge')
            out = jax.vmap(
                lambda row: jnp.convolve(row, kernel, mode='valid'))(
                    xp.reshape(-1, xp.shape[-1]))
            out = out.reshape(*x.shape[:-1], -1)
            return jnp.moveaxis(out, -1, axis)
        return conv1d(conv1d(img, 0), 1)

    mu_p, mu_g = blur(image_pred), blur(image_gt)
    mu_p2, mu_g2, mu_pg = mu_p ** 2, mu_g ** 2, mu_p * mu_g
    sigma_p2 = blur(image_pred ** 2) - mu_p2
    sigma_g2 = blur(image_gt ** 2) - mu_g2
    sigma_pg = blur(image_pred * image_gt) - mu_pg

    num = (2 * mu_pg + c1) * (2 * sigma_pg + c2)
    den = (mu_p2 + mu_g2 + c1) * (sigma_p2 + sigma_g2 + c2)
    return jnp.mean(num / den)
