"""Ray generation with BARF's +0.5 pixel-center convention.

Mirrors ``camera.py:228-302`` (``get_center_and_ray{,_v2,_v3}``): pixel grid
(x+0.5, y+0.5), lifted through K^-1 to camera space, transformed to world by
the inverse of the world-to-camera pose. Rays are NOT normalized (the
integrator multiplies dists by |d|, ``hashgrid/__init__.py:347``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scanerf_tpu.utils import lie


def pixel_grid(H: int, W: int, dtype=jnp.float32) -> jax.Array:
    """[H*W, 2] grid of (x+0.5, y+0.5) pixel centers, row-major in y."""
    y = jnp.arange(H, dtype=dtype) + 0.5
    x = jnp.arange(W, dtype=dtype) + 0.5
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([X, Y], axis=-1).reshape(-1, 2)


def get_center_and_ray(
    xy: jax.Array, pose_w2c: jax.Array, K: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Centers and directions for pixel coords ``xy``.

    Args:
        xy: [..., N, 2] pixel coordinates (already +0.5 centered).
        pose_w2c: [..., 3, 4] world-to-camera pose(s).
        K: [..., 3, 3] intrinsics.

    Returns:
        (center [..., N, 3], ray [..., N, 3]); differentiable w.r.t. pose.
    """
    grid_3d = lie.img2cam(lie.to_hom(xy), K)
    center_3d = jnp.zeros_like(grid_3d)
    grid_3d = lie.cam2world(grid_3d, pose_w2c)
    center_3d = lie.cam2world(center_3d, pose_w2c)
    return center_3d, grid_3d - center_3d


def get_all_rays(
    H: int, W: int, pose_w2c: jax.Array, K: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """All rays of an HxW image. Returns ([..., H*W, 3], [..., H*W, 3])."""
    xy = pixel_grid(H, W)
    return get_center_and_ray(xy, pose_w2c, K)


def make_intrinsics(fx, fy, cx, cy, dtype=jnp.float32) -> jax.Array:
    return jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=dtype)


def patch_ray_indices(key: jax.Array, H: int, W: int, num_patch: int) -> jax.Array:
    """2x2-patch ray indices into a flattened HxW image.

    Mirrors the reference's patch sampler (``tile.py:902-915`` /
    ``tools/utils.py:89-104``): draw ``num_patch`` x- and y-coordinates,
    pair them, expand each into a 2x2 patch. Returns [num_patch*4] int32.
    """
    kx, ky = jax.random.split(key)
    # coordinates in [0, W-2] / [0, H-2] so the 2x2 patch stays in-bounds
    xs = jax.random.randint(kx, (num_patch,), 0, W - 1)
    ys = jax.random.randint(ky, (num_patch,), 0, H - 1)
    base = ys * W + xs
    offsets = jnp.array([0, 1, W, W + 1], dtype=base.dtype)
    return (base[:, None] + offsets[None, :]).reshape(-1)
