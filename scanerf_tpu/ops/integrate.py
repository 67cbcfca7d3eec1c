"""Volume-rendering integration (alpha compositing).

Exact semantics of ``hashgrid/__init__.py:344-366``:

- dists are scaled by |rays_d| (rays are unnormalized),
- with ``infinity=True`` the last dist becomes 1e10 (opaque background),
- alpha = 1 - exp(-sigma * dist),
- transmittance T_i = prod_{j<i} (1 - alpha_j + 1e-6)   (exclusive cumprod
  with the reference's +1e-6 stabilizer),
- ``T_left`` is T at the LAST sample index, i.e. it excludes the last
  sample's own alpha — a reference quirk we preserve (it is the T used to
  composite the background behind the foreground pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def integrate_weights(
    sigma: jax.Array,
    dists: jax.Array,
    rays_d: jax.Array,
    infinity: bool = False,
    eps: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """Compositing weights.

    Args:
        sigma: [N, S] or [N, S, 1] densities.
        dists: [N, S] sample spacings (un-scaled).
        rays_d: [N, 3] unnormalized ray directions.
        infinity: force the last interval to 1e10.

    Returns:
        (weights [N, S], T_left [N]) with T_left = prod_{j<S-1}(1-a_j+eps).
    """
    if sigma.ndim == 3:
        sigma = sigma[..., 0]
    d = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if infinity:
        d = d.at[:, -1].set(1e10)
    alpha = 1.0 - jnp.exp(-sigma * d)
    trans = 1.0 - alpha + eps
    # exclusive cumprod: T_0 = 1, T_i = prod_{j<i} trans_j
    T = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(trans[:, :1]), trans], axis=1), axis=1
    )[:, :-1]
    weights = alpha * T
    return weights, T[:, -1]


def accumulate(weights: jax.Array, attr: jax.Array) -> jax.Array:
    """sum_i w_i * attr_i over the sample axis (``hashgrid/__init__.py:362``).

    weights: [N, S]; attr: [N, S, C] -> [N, C].
    """
    return jnp.sum(weights[..., None] * attr, axis=1)
