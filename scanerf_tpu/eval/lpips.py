"""LPIPS perceptual metric (AlexNet variant) in pure JAX.

Completes the reference's evaluation hook (``postprocess/evaluation.py:5``
imports lpips but keeps it commented out) and the BASELINE.md quality
targets ("report SSIM/LPIPS").

The metric follows Zhang et al. 2018 exactly:

1. images scaled to [-1, 1], normalized by the LPIPS per-channel
   shift/scale,
2. AlexNet feature stack (conv1..conv5, ReLU taps, maxpool between
   stages 1-2-3),
3. per-tap channel-unit-normalization, squared difference, learned 1x1
   non-negative linear head, spatial mean, summed over the 5 taps.

Pretrained weights cannot ship with this repo (no network egress in the
build environment and no vendored binaries); they load from an ``.npz``
produced once by ``scripts/export_lpips_weights.py`` on any machine with
the official ``lpips`` pip package, pointed to by the
``SCANERF_LPIPS_WEIGHTS`` env var (or an explicit path). When no weight
file is available, callers degrade to PSNR/SSIM-only output — the same
behavior as the reference's commented-out hook.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

ENV_VAR = "SCANERF_LPIPS_WEIGHTS"

# LPIPS ScalingLayer constants (lpips/lpips.py)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature stack: (out_ch, kernel, stride, pad), maxpool before?
_ALEX = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]


def weights_available(path: str | None = None) -> bool:
    p = path or os.environ.get(ENV_VAR, "")
    return bool(p) and os.path.exists(p)


def load_weights(path: str | None = None) -> dict | None:
    """Load {convN_w, convN_b, linN_w} arrays; None when unavailable."""
    p = path or os.environ.get(ENV_VAR, "")
    if not p or not os.path.exists(p):
        return None
    data = np.load(p)
    return {k: data[k] for k in data.files}


def _conv(x, w, b, stride, pad):
    import jax

    # w: [out, in, kh, kw] (torch layout); x: [N, C, H, W]
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _maxpool(x):
    import jax

    return jax.lax.reduce_window(
        x, -np.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def _features(params: dict, x):
    """AlexNet tap activations for x [N, 3, H, W] in LPIPS-normalized
    space. Returns 5 arrays."""
    import jax.numpy as jnp

    taps = []
    h = x
    for i, (_, _, stride, pad, pool) in enumerate(_ALEX):
        if pool:
            h = _maxpool(h)
        h = _conv(h, params[f"conv{i}_w"], params[f"conv{i}_b"], stride, pad)
        h = jnp.maximum(h, 0.0)
        taps.append(h)
    return taps


def lpips(params: dict, img0, img1):
    """LPIPS distance between two [H, W, 3] (or [N, H, W, 3]) images in
    [0, 1] RGB. Returns a scalar (or [N])."""
    import jax.numpy as jnp

    def prep(im):
        im = jnp.asarray(im, jnp.float32)
        if im.ndim == 3:
            im = im[None]
        x = im * 2.0 - 1.0  # [0,1] -> [-1,1]
        x = (x - _SHIFT) / _SCALE
        return x.transpose(0, 3, 1, 2)  # NCHW

    t0 = _features(params, prep(img0))
    t1 = _features(params, prep(img1))
    total = 0.0
    for i, (a, b) in enumerate(zip(t0, t1)):
        na = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2  # [N, C, H, W]
        w = jnp.asarray(params[f"lin{i}_w"]).reshape(1, -1, 1, 1)  # [1,C,1,1]
        total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(1, 2))
    return total[0] if total.shape == (1,) else total


class LPIPSMetric:
    """Stateful wrapper: jitted distance fn when weights exist, else a
    no-op flagged by ``available``."""

    def __init__(self, path: str | None = None):
        self.params = load_weights(path)
        self.available = self.params is not None
        if self.available:
            import jax

            self._fn = jax.jit(partial(lpips, self.params))

    def __call__(self, img0, img1) -> float:
        if not self.available:
            return float("nan")
        return float(self._fn(img0, img1))
