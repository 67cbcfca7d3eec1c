"""Decompose sample_points_grid's on-chip cost (round 3: the fg sampler
is the single biggest training-step piece at ~200 ms standalone).

Pieces, each jitted separately at the default 16K x 512 x 128 workload:
  march  — candidate points + occupancy gather + cumsum (no inversion)
  invert — the [N, S, M] compare-reduce CDF inversion alone
  place  — take_along_axis placement from precomputed seg_idx
  full   — sample_points_grid end-to-end

Timing: scalar probe fetch only (axon rule — never fetch arrays).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.ops import sampling
from scanerf_tpu.ops.intersect import ray_aabb


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    return (time.perf_counter() - t0) / n


def main():
    N, S, M = 16384, 128, 512
    R = 64
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 0.2)
    rd = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    grid = jnp.asarray(rng.rand(R, R, R) < 0.3)
    corner = jnp.asarray(np.array([-1.0, -1.0, -1.0], np.float32))
    size = jnp.asarray(np.array([2.0, 2.0, 2.0], np.float32))

    @jax.jit
    def march(o, d):
        bounds = ray_aabb(o, d, corner + size / 2, size / 2)
        t_near, t_far = bounds[:, 0], bounds[:, 1]
        hit = t_near != -1.0
        t_near = jnp.where(hit, t_near, 0.0)
        t_far = jnp.where(hit, t_far, 1.0)
        frac = jnp.linspace(0.0, 1.0, M + 1, dtype=o.dtype)
        edges = t_near[:, None] + (t_far - t_near)[:, None] * frac[None, :]
        mids = 0.5 * (edges[:, :-1] + edges[:, 1:])
        pts = o[:, None, :] + mids[..., None] * d[:, None, :]
        occ = sampling.occupancy_lookup(pts, grid, corner, size)
        seg = (t_far - t_near)[:, None] / M
        cum = jnp.cumsum(jnp.where(occ, seg, 0.0), axis=1)
        return cum, edges

    cum, edges = march(ro, rd)
    t_march = timeit(march, ro, rd)
    print(f"march+gather+cumsum: {t_march*1e3:.1f} ms", flush=True)

    total = cum[:, -1]
    j = jnp.arange(S, dtype=jnp.float32)
    s = j[None, :] * (total[:, None] / S)

    @jax.jit
    def invert(c, ss):
        return sampling._cdf_invert(c, ss, M)

    seg_idx = invert(cum, s)
    t_inv = timeit(invert, cum, s)
    print(f"cdf compare-reduce:  {t_inv*1e3:.1f} ms", flush=True)

    @jax.jit
    def place(c, ss, si, e):
        cum_before = jnp.take_along_axis(
            jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=1), si,
            axis=1)
        seg_left = jnp.take_along_axis(e[:, :-1], si, axis=1)
        return seg_left + (ss - cum_before)

    t_place = timeit(place, cum, s, seg_idx, edges)
    print(f"placement gathers:   {t_place*1e3:.1f} ms", flush=True)

    @jax.jit
    def full(o, d):
        return sampling.sample_points_grid(
            o, d, S, grid, corner, size, M, backend="xla"
        )

    t_full = timeit(full, ro, rd)
    print(f"full sampler (xla):  {t_full*1e3:.1f} ms", flush=True)
    print(f"accounted: {(t_march+t_inv+t_place)*1e3:.1f} ms", flush=True)

    @jax.jit
    def fused(o, d):
        return sampling.sample_points_grid(
            o, d, S, grid, corner, size, M, backend="pallas"
        )

    # parity spot-check on chip before timing
    zx, dx_, vx = full(ro, rd)
    zp, dp_, vp = fused(ro, rd)
    same_v = bool(jnp.all(vx == vp))
    dz = float(jnp.max(jnp.where(vx[:, None], jnp.abs(zx - zp), 0.0)))
    print(f"fused parity: valid match={same_v} max|dz|={dz:.2e}", flush=True)
    t_fused = timeit(fused, ro, rd)
    print(f"full sampler (fused pallas): {t_fused*1e3:.1f} ms", flush=True)

    # the training-shaped per-tile grid (128^3) exercises the large-LUT
    # scan path; the kernel gates itself off via supports() if too big
    from scanerf_tpu.ops.pallas import sampler as ps

    R2 = 128
    grid2 = jnp.asarray(rng.rand(R2, R2, R2) < 0.3)
    if ps.supports(grid2.shape, M):
        @jax.jit
        def fused2(o, d):
            return sampling.sample_points_grid(
                o, d, S, grid2, corner, size, M, backend="pallas"
            )

        @jax.jit
        def full2(o, d):
            return sampling.sample_points_grid(
                o, d, S, grid2, corner, size, M, backend="xla"
            )

        t2x = timeit(full2, ro, rd)
        t2p = timeit(fused2, ro, rd)
        print(f"128^3 grid: xla {t2x*1e3:.1f} ms, fused {t2p*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
