"""Image quality metrics: PSNR and gaussian-window SSIM.

Mirrors ``tools/utils.py:49-70`` (``Metric``: 255-scale PSNR) and
``tools/ssim.py`` (11x11 gaussian window, sigma 1.5, C1/C2 from K=0.01 /
0.03 at L=1). Implemented in JAX so eval runs on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jax.Array, gt: jax.Array, max_val: float = 1.0) -> jax.Array:
    """PSNR over [0, max_val] images.

    ``pred`` is clipped to the displayable range first: the reference
    evaluates SAVED images (uint8 round-trip, tools/utils.py:49-70), so
    raw-float accumulation overshoot must not leak into the metric.
    """
    pred = jnp.clip(pred, 0.0, max_val)
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g)


def ssim(
    pred: jax.Array, gt: jax.Array, window_size: int = 11, sigma: float = 1.5
) -> jax.Array:
    """Mean SSIM over an [H, W, C] image pair in [0, 1].

    ``pred`` is clipped to [0, 1] (same saved-image protocol as ``psnr``)
    and the moment-difference variance estimates are floored at 0 —
    f32 cancellation in ``E[x^2] - mu^2`` can go slightly negative, and
    an unclipped out-of-range render can push the raw formula past 1
    (observed: mean "SSIM" 1.41 on a render with unobserved-region
    overshoot).
    """
    pred = jnp.clip(pred, 0.0, 1.0)
    win = jnp.asarray(_gaussian_window(window_size, sigma), pred.dtype)
    win = win[:, :, None, None]  # HWIO with 1 in / 1 out

    def conv(x):
        # x [H, W, C] -> depthwise conv per channel
        x = jnp.transpose(x, (2, 0, 1))[:, None]  # [C, 1, H, W]
        y = jax.lax.conv_general_dilated(
            x, jnp.transpose(win, (3, 2, 0, 1)),  # OIHW
            window_strides=(1, 1), padding="VALID",
        )
        return jnp.transpose(y[:, 0], (1, 2, 0))

    mu1, mu2 = conv(pred), conv(gt)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = jnp.maximum(conv(pred * pred) - mu1_sq, 0.0)
    s2 = jnp.maximum(conv(gt * gt) - mu2_sq, 0.0)
    s12 = conv(pred * gt) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return jnp.mean(ssim_map)
