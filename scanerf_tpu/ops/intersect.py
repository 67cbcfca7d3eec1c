"""Ray-AABB intersection (slab test).

Semantics mirror ``cuda/include/cuda_utils.h:513`` (``RayAABBIntersection``)
and its wrappers ``ray_aabb_intersection{,_v2}`` (``cuda/helper_kernel.cu``):
boxes given as (center, half-size); a miss returns (-1, -1); entry t is
clamped to 0 when the origin is inside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_aabb(
    rays_o: jax.Array,
    rays_d: jax.Array,
    center: jax.Array,
    half_size: jax.Array,
    eps: float = 1e-9,
) -> jax.Array:
    """Slab-test rays against one AABB (broadcasts over leading dims).

    Args:
        rays_o, rays_d: [..., 3]
        center, half_size: [3] or broadcastable to [..., 3]

    Returns:
        bounds [..., 2] = (t_near, t_far); (-1, -1) on miss.
        t_near is clamped to >= 0 (reference behavior for inside origins).
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < eps, jnp.where(rays_d >= 0, eps, -eps), rays_d)
    t0 = (center - half_size - rays_o) * inv_d
    t1 = (center + half_size - rays_o) * inv_d
    t_small = jnp.minimum(t0, t1)
    t_big = jnp.maximum(t0, t1)
    t_near = jnp.max(t_small, axis=-1)
    t_far = jnp.min(t_big, axis=-1)
    t_near = jnp.maximum(t_near, 0.0)
    hit = (t_far > t_near) & (t_far > 0)
    bounds = jnp.stack([t_near, t_far], axis=-1)
    return jnp.where(hit[..., None], bounds, -jnp.ones_like(bounds))


def ray_aabb_multi(
    rays_o: jax.Array,
    rays_d: jax.Array,
    centers: jax.Array,
    half_sizes: jax.Array,
) -> jax.Array:
    """Each ray against K boxes (``ray_aabb_intersection_v2``).

    Args:
        rays_o, rays_d: [N, 3]; centers, half_sizes: [K, 3]
    Returns:
        bounds [N, K, 2]
    """
    return ray_aabb(
        rays_o[:, None, :], rays_d[:, None, :], centers[None], half_sizes[None]
    )
