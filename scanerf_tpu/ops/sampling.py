"""Ray samplers: occupancy-grid foreground sampling and inverse-z background.

TPU-first redesign of the reference's per-ray serial DDA
(``cuda/helper_kernel.cu:539-669``, ``sample_points_grid``). The reference
marches each ray through the occupancy grid twice, allocating the 128
samples proportionally to the occupied segment lengths and placing them
uniformly within each segment (``uniform_sample_bound_v3``: left-edge
convention, constant per-segment spacing).

On TPU a serial DDA per ray defeats the VPU. We compute the identical
distribution with fixed shapes and no data-dependent loops:

1. march M uniform candidate segments between the ray's AABB entry/exit,
2. test each segment midpoint against the occupancy grid (one gather),
3. build the CDF of occupied arc length and invert it at ``num_sample``
   equally spaced quantiles (left-edge convention, matching v3).

Samples land only inside occupied cells, their density is proportional to
occupied segment length, and dists = total_occupied_len / num_sample —
the same distribution the CUDA DDA produces (the reference's per-segment
integer rounding is replaced by the exact continuum allocation). Empty /
missed rays return the reference's -1 sentinels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scanerf_tpu.ops.intersect import ray_aabb


def occupancy_lookup(
    points: jax.Array,
    grid: jax.Array,
    grid_corner: jax.Array,
    grid_size: jax.Array,
) -> jax.Array:
    """Boolean occupancy at world-space points.

    grid: [Rx, Ry, Rz] bool; grid spans [corner, corner+size].
    Out-of-bounds points are unoccupied.
    """
    res = jnp.array(grid.shape, dtype=points.dtype)
    u = (points - grid_corner) / grid_size * res
    cell = jnp.floor(u).astype(jnp.int32)
    inb = jnp.all((cell >= 0) & (cell < jnp.array(grid.shape)), axis=-1)
    cell = jnp.clip(cell, 0, jnp.array(grid.shape) - 1)
    occ = grid[cell[..., 0], cell[..., 1], cell[..., 2]]
    return occ & inb


def _cdf_invert(
    cum: jax.Array, s: jax.Array, M: int, two_level: bool = False
) -> jax.Array:
    """seg_idx[n, j] = #{m : cum[n, m] <= s[n, j]}, clipped to [0, M).

    The one-shot [N, S, M] broadcast-compare-reduce is the FASTEST
    implementation on this fabric despite its ~1e9 lane ops at the
    default workload — both measured alternatives lose end-to-end
    (PERF.md round 3): a vmapped ``jnp.searchsorted`` lowers to a
    latency-bound sequential search (-21% step throughput), and the
    two-level variant below (coarse block-tail compare + 16-wide
    take_along_axis fine step, ~15x fewer vector ops) loses ~2x to its
    gather. XLA fuses the compare into the reduce without materializing
    [N, S, M]; gathers, not FLOPs, are what this fabric punishes.
    """
    N, S = s.shape
    C = 16  # fine block width (two-level variant)
    if not two_level or M % C != 0 or M <= C:
        seg = jnp.sum(
            (cum[:, None, :] <= s[:, :, None]).astype(jnp.int32), axis=-1
        )
        return jnp.clip(seg, 0, M - 1)
    nb = M // C
    # block b covers cum[:, b*C:(b+1)*C]; its tail is cum[:, (b+1)*C-1]
    tails = cum[:, C - 1::C]  # [N, nb]
    blk = jnp.sum(
        (tails[:, None, :] <= s[:, :, None]).astype(jnp.int32), axis=-1
    )  # [N, S] in [0, nb]
    blk = jnp.clip(blk, 0, nb - 1)
    base = blk * C  # [N, S]
    idx = base[:, :, None] + jnp.arange(C, dtype=jnp.int32)[None, None]
    fine = jnp.take_along_axis(
        cum[:, None, :], jnp.minimum(idx, M - 1), axis=-1
    )  # [N, S, C]
    seg = base + jnp.sum(
        (fine <= s[:, :, None]).astype(jnp.int32), axis=-1
    )
    return jnp.clip(seg, 0, M - 1)


def cdf_sample_from_bounds(
    rays_o: jax.Array,
    rays_d: jax.Array,
    t_near: jax.Array,
    t_far: jax.Array,
    num_sample: int,
    grid: jax.Array,
    grid_corner: jax.Array,
    grid_size: jax.Array,
    num_march: int,
    backend: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Shared CDF-sampling core: march ``num_march`` candidate segments
    over [t_near, t_far], weight by occupancy, invert at ``num_sample``
    left-edge quantiles. Returns z_vals [N, S] and the total occupied
    arc length [N] (caller derives validity/dists/sentinels).

    ``backend``: "xla" (the op-by-op composition below, also the parity
    oracle), "pallas" (ops/pallas/sampler.py fused kernel), or "auto"
    (pallas on TPU when the grid fits the kernel's bitpacked LUT and
    num_march is lane-aligned).
    """
    if backend == "auto":
        from scanerf_tpu.ops.pallas import sampler as _ps

        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and _ps.supports(grid.shape, num_march)
            else "xla"
        )
    if backend == "pallas":
        from scanerf_tpu.ops.pallas import sampler as _ps

        return _ps.sample_fused(
            rays_o, rays_d, t_near, t_far, num_sample, grid,
            grid_corner, grid_size, num_march,
        )

    # candidate segment edges/midpoints
    frac = jnp.linspace(0.0, 1.0, num_march + 1, dtype=rays_o.dtype)
    edges = t_near[:, None] + (t_far - t_near)[:, None] * frac[None, :]  # [N, M+1]
    mids = 0.5 * (edges[:, :-1] + edges[:, 1:])  # [N, M]
    pts = rays_o[:, None, :] + mids[..., None] * rays_d[:, None, :]  # [N, M, 3]
    occ = occupancy_lookup(pts, grid, grid_corner, grid_size)  # [N, M] bool

    seg = (t_far - t_near)[:, None] / num_march  # [N, 1] segment length
    occ_len = jnp.where(occ, seg, 0.0)  # [N, M]
    cum = jnp.cumsum(occ_len, axis=1)  # [N, M] inclusive
    total = cum[:, -1]  # [N]

    # invert the CDF at left-edge quantiles s_j = j * total / S
    j = jnp.arange(num_sample, dtype=rays_o.dtype)
    s = j[None, :] * (total[:, None] / num_sample)  # [N, S]
    seg_idx = _cdf_invert(cum, s, num_march)
    cum_before = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum], axis=1), seg_idx, axis=1
    )
    seg_left = jnp.take_along_axis(edges[:, :-1], seg_idx, axis=1)
    z_vals = seg_left + (s - cum_before)
    return z_vals, total


def sample_points_grid(
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_sample: int,
    grid: jax.Array,
    grid_corner: jax.Array,
    grid_size: jax.Array,
    num_march: int = 512,
    backend: str = "auto",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Occupancy-proportional sampling (see module docstring).

    Args:
        rays_o, rays_d: [N, 3] (d unnormalized; t is in units of |d|).
        num_sample: S samples per ray.
        grid: [Rx, Ry, Rz] bool occupancy; spans [corner, corner+size]
              (the tile's INNER bbox: min_bbox + bbox_size/4, bbox_size/2 —
              ``hashgrid/__init__.py:278-285``).
        num_march: M candidate segments (resolution of the march).
        backend: see ``cdf_sample_from_bounds``.

    Returns:
        z_vals [N, S], dists [N, S] (-1 sentinels on invalid rays),
        valid [N] bool.
    """
    bounds = ray_aabb(rays_o, rays_d, grid_corner + grid_size / 2, grid_size / 2)
    t_near, t_far = bounds[:, 0], bounds[:, 1]
    hit = t_near != -1.0
    t_near = jnp.where(hit, t_near, 0.0)
    t_far = jnp.where(hit, t_far, 1.0)

    z_vals, total = cdf_sample_from_bounds(
        rays_o, rays_d, t_near, t_far, num_sample, grid,
        grid_corner, grid_size, num_march, backend=backend,
    )
    valid = hit & (total > 0)
    dists = jnp.broadcast_to(total[:, None] / num_sample, z_vals.shape)

    z_vals = jnp.where(valid[:, None], z_vals, -1.0)
    dists = jnp.where(valid[:, None], dists, -1.0)
    # the reference sampler is a no-grad CUDA kernel (tile.py calls it
    # under torch.no_grad()); gradients reach sample positions only
    # through rays_o/rays_d, never through z placement
    return (
        jax.lax.stop_gradient(z_vals),
        jax.lax.stop_gradient(dists),
        valid,
    )


def background_window_sampling(
    rays_o: jax.Array,
    rays_d: jax.Array,
    bg_depth: jax.Array,  # [N] mesh depth behind the tile (0 = none)
    bbox_center: jax.Array,
    bbox_size: jax.Array,
    num_sample: int,
    sample_range: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mesh-guided BS background sampling, jit-side half.

    Mirrors ``background_sampling_cuda`` (cuda/sample_kernel.cu:17-68) +
    ``FastMesh.background_sampling`` (:79-87): a uniform window of
    ``sample_range`` starting at ``max(tile exit, bg_depth - range/2)``.
    The mesh depth itself comes from precomputed per-camera maps
    (``FastMesh.compute_bgdepth``) — the TPU-first replacement for the
    reference's in-loop CUDA mesh queries. Rays without background
    (bg_depth <= 0) or missing the bbox are invalid.
    """
    bounds = ray_aabb(rays_o, rays_d, bbox_center, bbox_size / 2.0)
    t_exit = bounds[:, 1]
    valid = (bounds[:, 1] != -1.0) & (bg_depth > 0)
    start = jnp.maximum(t_exit, bg_depth - sample_range / 2.0)
    step = sample_range / num_sample
    i = jnp.arange(num_sample, dtype=rays_o.dtype)
    z_vals = start[:, None] + i[None, :] * step
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[:, :1], 1e-6)], axis=-1)
    z_vals = jnp.where(valid[:, None], z_vals, -1.0)
    return jax.lax.stop_gradient(z_vals), jax.lax.stop_gradient(dists), valid


def inverse_z_sampling(
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_sample: int,
    bbox_center: jax.Array,
    bbox_size: jax.Array,
    invalid_underground: bool = False,
    far: float = 1e6,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Inverse-depth background samples beyond the (doubled) tile bbox.

    Mirrors ``hashgrid/__init__.py:305-337``: samples from the bbox exit
    out to ``far`` with z = 1 / lerp(1/(t_exit+1e-6), 1/far, t); rays that
    miss the bbox get exit t = 0.1; last dist = 1e-6; the
    ``invalid_underground`` gate marks rays exiting through the inner-bbox
    floor (y == inner corner y) invalid (``hashgrid/__init__.py:287-293``).
    """
    bounds = ray_aabb(rays_o, rays_d, bbox_center, bbox_size / 2)
    miss = jnp.any(bounds == -1.0, axis=-1)
    t_exit = jnp.where(miss, 0.1, bounds[:, 1])

    if invalid_underground:
        outgoing = rays_o + bounds[:, 1:] * rays_d
        inner_corner_y = bbox_center[1] - bbox_size[1] / 4.0
        valid = ~(jnp.abs(outgoing[:, 1] - inner_corner_y) < 1e-4)
    else:
        valid = jnp.ones_like(rays_d[:, 0], dtype=bool)

    t_vals = jnp.linspace(0.0, 1.0, num_sample, dtype=rays_o.dtype)[None, :]
    z_vals = 1.0 / (1.0 / (t_exit[:, None] + 1e-6) * (1.0 - t_vals) + (1.0 / far) * t_vals)
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[:, :1], 1e-6)], axis=-1)
    # no-grad like the reference (@torch.no_grad, hashgrid/__init__.py:305)
    return jax.lax.stop_gradient(z_vals), jax.lax.stop_gradient(dists), valid
