"""SSIM / MS-SSIM — pure-JAX image similarity losses.

The reference's HPO plan (reports/Results.xlsx: Loss ∈ {MSE, MS-SSIM}) calls
for MS-SSIM on world-model reconstructions. Implemented with depthwise
gaussian convs (VPU/MXU-friendly, fully jit-able); standard constants
k1=0.01, k2=0.03, and the Wang et al. MS-SSIM power weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / g.sum()


def _blur(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable gaussian blur on (B, H, W, C), VALID windows."""
    k = kernel.shape[0]
    c = x.shape[-1]
    kh = jnp.tile(kernel.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(kernel.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c)
    return x


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def ssim(x: jnp.ndarray, y: jnp.ndarray, max_val: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over (B, H, W, C) image batches, in [−1, 1] (1 = identical)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    kernel = _gaussian_kernel(kernel_size, sigma)
    k1, k2 = 0.01, 0.03
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_x = _blur(x, kernel)
    mu_y = _blur(y, kernel)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = _blur(x * x, kernel) - mu_xx
    sigma_y = _blur(y * y, kernel) - mu_yy
    sigma_xy = _blur(x * y, kernel) - mu_xy

    lum = (2 * mu_xy + c1) / (mu_xx + mu_yy + c1)
    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    return jnp.mean(lum * cs), jnp.mean(cs)


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2× average-pool (B, H, W, C)."""
    b, h, w, c = x.shape
    return x[:, :h - h % 2, :w - w % 2, :].reshape(
        b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, max_val: float = 1.0,
            levels: int | None = None) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al.). Needs H, W ≥ 11·2^(levels−1); the level
    count auto-shrinks for small images (weights renormalized)."""
    max_levels = 1
    hw = min(x.shape[1], x.shape[2])
    while max_levels < 5 and hw // (2 ** max_levels) >= 11:
        max_levels += 1
    n = min(levels or max_levels, max_levels)
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:n])
    weights = weights / weights.sum()

    vals = []
    for i in range(n):
        s, cs = ssim(x, y, max_val)
        vals.append(s if i == n - 1 else cs)
        if i < n - 1:
            x, y = _downsample2(x), _downsample2(y)
    vals = jnp.stack(vals)
    return jnp.prod(jnp.clip(vals, 1e-6) ** weights)


def ms_ssim_loss(x: jnp.ndarray, y: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    return 1.0 - ms_ssim(x, y, max_val)
