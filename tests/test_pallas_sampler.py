"""Parity: fused Pallas CDF sampler vs the XLA composition.

The kernel (ops/pallas/sampler.py) computes the same continuum
distribution as ``sample_points_grid``'s op-by-op path but with a
Hillis-Steele VMEM scan instead of ``jnp.cumsum``, so fp rounding of
the CDF differs at segment boundaries: quantiles that tie with a cum
value can shift by a segment (or across a zero-occupancy run — the
reference semantics place such a sample at the run's far edge either
way). Parity is therefore asserted distributionally — identical valid
masks, totals to fp, near-all samples within a hundredth of a segment,
and equal in-occupied placement rates — not bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanerf_tpu.ops import sampling as S
from scanerf_tpu.ops.intersect import ray_aabb
from scanerf_tpu.ops.pallas import sampler as ps


def _mk(seed, N=300, res=(64, 64, 64), density=0.3):
    rng = np.random.default_rng(seed)
    grid = jnp.asarray(rng.random(res) < density)
    corner = jnp.asarray([-1.0, -1.2, -0.8])
    size = jnp.asarray([2.0, 2.4, 1.6])
    o = jnp.asarray(rng.normal(0, 2.0, (N, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 1.0, (N, 3)), jnp.float32)
    return grid, corner, size, o, d


@pytest.mark.parametrize("res", [(64, 64, 64), (40, 64, 33)])
@pytest.mark.parametrize("S_n,M", [(64, 512), (32, 128)])
def test_fused_matches_xla(res, S_n, M):
    grid, corner, size, o, d = _mk(1, res=res)
    z1, d1, v1 = S.sample_points_grid(o, d, S_n, grid, corner, size, M, backend="xla")
    z2, d2, v2 = S.sample_points_grid(o, d, S_n, grid, corner, size, M, backend="pallas")
    assert bool(jnp.all(v1 == v2))
    assert int(v1.sum()) > 5  # the scene actually exercises the kernel
    # totals (dists are total/S broadcast) match to fp
    np.testing.assert_allclose(
        np.asarray(jnp.where(v1[:, None], d1, 0.0)),
        np.asarray(jnp.where(v1[:, None], d2, 0.0)),
        rtol=1e-5, atol=1e-7,
    )
    # near-all z agree within 0.01 segment lengths
    bounds = ray_aabb(o, d, corner + size / 2, size / 2)
    seglen = jnp.where(v1, (bounds[:, 1] - bounds[:, 0]) / M, 1.0)
    rel = jnp.where(v1[:, None], jnp.abs(z1 - z2), 0.0) / seglen[:, None]
    assert float((rel > 0.01).mean()) < 2e-3
    # identical placement quality: samples land in occupied cells at the
    # same rate (ties at zero-runs may move a sample, not degrade it)
    fr = []
    for z, v in ((z1, v1), (z2, v2)):
        pts = o[:, None, :] + z[..., None] * d[:, None, :]
        occ = S.occupancy_lookup(pts, grid, corner, size)
        fr.append(float(jnp.where(v[:, None], occ, True).mean()))
    assert abs(fr[0] - fr[1]) < 5e-3


def test_supports_gate():
    assert ps.supports((64, 64, 64), 512)
    assert not ps.supports((64, 64, 64), 500)  # march not lane-aligned
    assert not ps.supports((256, 256, 256), 512)  # LUT too large
    # auto backend silently falls back on an unsupported march count
    grid, corner, size, o, d = _mk(2, N=64)
    z, dd, v = S.sample_points_grid(o, d, 16, grid, corner, size, 96, backend="auto")
    assert z.shape == (64, 16)


def test_pack_grid_roundtrip():
    rng = np.random.default_rng(3)
    grid = jnp.asarray(rng.random((17, 9, 41)) < 0.5)
    lut = np.asarray(ps.pack_grid(grid))
    rx, ry, rz = grid.shape
    wz = -(-rz // 32)
    flat = lut.reshape(-1)
    g = np.asarray(grid)
    for _ in range(200):
        x, y, z = rng.integers(0, rx), rng.integers(0, ry), rng.integers(0, rz)
        w = (x * ry + y) * wz + z // 32
        assert ((flat[w] >> (z % 32)) & 1) == g[x, y, z]


def test_pose_grad_traces_through_fused_sampler():
    """Pose-differentiable rays must trace: the kernel's custom JVP
    declares zero tangents (no-grad sampler spec), so grads reach the
    sample points only through the o + z*d recombination outside."""
    grid, corner, size, o, d = _mk(5, N=32)

    def f(o, backend):
        z, dd, v = S.sample_points_grid(
            o, d, 16, grid, corner, size, 128, backend=backend)
        pts = o[:, None, :] + z[..., None] * d[:, None, :]
        return jnp.sum(jnp.where(v[:, None, None], pts, 0.0) ** 2)

    g_x = jax.grad(lambda o: f(o, "xla"))(o)
    g_p = jax.grad(lambda o: f(o, "pallas"))(o)
    assert bool(jnp.all(jnp.isfinite(g_p)))
    # same gradient structure (z is stop-grad in both backends)
    np.testing.assert_allclose(
        np.asarray(g_x), np.asarray(g_p), rtol=1e-4, atol=1e-5)


def test_fused_in_renderer_union_path():
    """cdf_sample_from_bounds is the renderer's union-grid sampler; the
    pallas backend must accept the padded union grid shape."""
    grid, corner, size, o, d = _mk(4, res=(48, 48, 48), density=0.5)
    bounds = ray_aabb(o, d, corner + size / 2, size / 2)
    tn = jnp.where(bounds[:, 0] != -1.0, bounds[:, 0], 0.0)
    tf = jnp.where(bounds[:, 0] != -1.0, bounds[:, 1], 1.0)
    z1, t1 = S.cdf_sample_from_bounds(
        o, d, tn, tf, 32, grid, corner, size, 256, backend="xla")
    z2, t2 = S.cdf_sample_from_bounds(
        o, d, tn, tf, 32, grid, corner, size, 256, backend="pallas")
    # totals agree to within 1.5 march segments (midpoints landing ON a
    # cell face floor to different cells across the two fp orderings)
    seg = np.asarray((tf - tn) / 256)
    assert np.all(np.abs(np.asarray(t1) - np.asarray(t2)) <= 1.5 * seg + 1e-7)
