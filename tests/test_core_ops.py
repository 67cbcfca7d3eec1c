"""Tests for SH, rays, ray-AABB, the integrator, and the samplers."""

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.ops import integrate, intersect, sampling
from scanerf_tpu.utils import rays as rays_lib
from scanerf_tpu.utils import sh as sh_lib


# --------------------------------------------------------------------- SH

def test_sh_dc_term():
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    out = sh_lib.sh_encoding(0, dirs)
    np.testing.assert_allclose(out, [[0.28209479]], atol=1e-6)


def test_sh_deg3_shape_and_linear_terms():
    dirs = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    out = sh_lib.sh_encoding(3, dirs)
    assert out.shape == (3, 16)
    # order of linear terms is (y, z, x) scaled by C1 (network.py:62)
    np.testing.assert_allclose(out[0, 1:4], [0.0, 0.0, sh_lib.C1], atol=1e-6)
    np.testing.assert_allclose(out[1, 1:4], [sh_lib.C1, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[2, 1:4], [0.0, sh_lib.C1, 0.0], atol=1e-6)


# --------------------------------------------------------------------- rays

def test_ray_through_principal_point():
    K = rays_lib.make_intrinsics(100.0, 100.0, 32.0, 24.0)
    pose = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=-1)  # identity w2c
    xy = jnp.array([[32.0, 24.0]])  # principal point (already centered coords)
    center, ray = rays_lib.get_center_and_ray(xy, pose, K)
    np.testing.assert_allclose(center, jnp.zeros((1, 3)), atol=1e-6)
    np.testing.assert_allclose(ray, [[0.0, 0.0, 1.0]], atol=1e-6)


def test_pixel_grid_convention():
    g = rays_lib.pixel_grid(2, 3)
    assert g.shape == (6, 2)
    np.testing.assert_allclose(g[0], [0.5, 0.5])
    np.testing.assert_allclose(g[1], [1.5, 0.5])  # x varies fastest
    np.testing.assert_allclose(g[3], [0.5, 1.5])


def test_rays_differentiable_wrt_pose():
    K = rays_lib.make_intrinsics(50.0, 50.0, 16.0, 16.0)
    xy = rays_lib.pixel_grid(4, 4)

    def f(se3):
        from scanerf_tpu.utils import lie

        pose = lie.se3_to_SE3(se3)
        c, d = rays_lib.get_center_and_ray(xy, pose, K)
        return jnp.sum(c) + jnp.sum(d)

    g = jax.grad(f)(jnp.zeros(6))
    assert jnp.all(jnp.isfinite(g))
    assert jnp.any(g != 0)


# --------------------------------------------------------------------- AABB

def test_ray_aabb_hit_miss():
    o = jnp.array([[-5.0, 0.0, 0.0], [-5.0, 10.0, 0.0], [0.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    b = intersect.ray_aabb(o, d, jnp.zeros(3), jnp.ones(3))
    np.testing.assert_allclose(b[0], [4.0, 6.0], atol=1e-5)  # hit
    np.testing.assert_allclose(b[1], [-1.0, -1.0])  # miss
    np.testing.assert_allclose(b[2], [0.0, 1.0], atol=1e-5)  # inside: near clamped to 0


def test_ray_aabb_multi():
    o = jnp.array([[-5.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    centers = jnp.array([[0.0, 0.0, 0.0], [0.0, 5.0, 0.0]])
    hs = jnp.ones((2, 3))
    b = intersect.ray_aabb_multi(o, d, centers, hs)
    assert b.shape == (1, 2, 2)
    np.testing.assert_allclose(b[0, 0], [4.0, 6.0], atol=1e-5)
    np.testing.assert_allclose(b[0, 1], [-1.0, -1.0])


# --------------------------------------------------------------- integrator

def numpy_integrate(sigma, dists, rays_d, infinity):
    """Dense NumPy oracle for hashgrid/__init__.py:344-360."""
    d = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    if infinity:
        d[:, -1] = 1e10
    alpha = 1 - np.exp(-sigma * d)
    trans = np.concatenate([np.ones_like(alpha[:, :1]), 1 - alpha + 1e-6], 1)
    T = np.cumprod(trans, axis=1)[:, :-1]
    return alpha * T, T[:, -1]


def test_integrator_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    sigma = rng.rand(4, 16).astype(np.float32) * 3
    dists = rng.rand(4, 16).astype(np.float32) * 0.1
    rays_d = rng.randn(4, 3).astype(np.float32)
    for infinity in (False, True):
        w, T = integrate.integrate_weights(
            jnp.asarray(sigma), jnp.asarray(dists), jnp.asarray(rays_d), infinity
        )
        w_ref, T_ref = numpy_integrate(sigma, dists.copy(), rays_d, infinity)
        np.testing.assert_allclose(w, w_ref, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(T, T_ref, rtol=1e-4, atol=1e-6)


def test_accumulate():
    w = jnp.array([[0.5, 0.5]])
    attr = jnp.array([[[1.0, 2.0], [3.0, 4.0]]])
    np.testing.assert_allclose(integrate.accumulate(w, attr), [[2.0, 3.0]])


# ----------------------------------------------------------------- sampling

def test_sample_points_grid_respects_occupancy():
    # grid with only the middle third occupied along x
    grid = np.zeros((8, 8, 8), dtype=bool)
    grid[3:5] = True
    corner = jnp.array([0.0, 0.0, 0.0])
    size = jnp.array([8.0, 8.0, 8.0])
    o = jnp.array([[-1.0, 4.0, 4.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    z, dist, valid = sampling.sample_points_grid(
        o, d, 32, jnp.asarray(grid), corner, size, num_march=256
    )
    assert bool(valid[0])
    pts_x = np.asarray(o[0, 0] + z[0] * d[0, 0])
    assert (pts_x >= 3.0 - 0.05).all() and (pts_x <= 5.0 + 0.05).all()
    # total occupied length is 2 -> spacing 2/32
    np.testing.assert_allclose(np.asarray(dist[0]), 2.0 / 32, atol=0.01)


def test_sample_points_grid_miss_and_empty():
    grid = np.zeros((4, 4, 4), dtype=bool)
    corner = jnp.zeros(3)
    size = jnp.full((3,), 4.0)
    o = jnp.array([[-1.0, 2.0, 2.0], [10.0, 10.0, 10.0]])
    d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    z, dist, valid = sampling.sample_points_grid(
        o, d, 8, jnp.asarray(grid), corner, size
    )
    assert not bool(valid[0]) and not bool(valid[1])
    np.testing.assert_allclose(z, -1.0)
    np.testing.assert_allclose(dist, -1.0)


def test_sample_points_grid_proportional_allocation():
    # two occupied slabs of lengths 1 and 3 -> samples split 1:3
    grid = np.zeros((8, 8, 8), dtype=bool)
    grid[1, :, :] = True   # x in [1,2) -> length 1
    grid[4:7, :, :] = True  # x in [4,7) -> length 3
    corner = jnp.zeros(3)
    size = jnp.full((3,), 8.0)
    o = jnp.array([[-1.0, 4.0, 4.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    z, dist, valid = sampling.sample_points_grid(
        o, d, 64, jnp.asarray(grid), corner, size, num_march=512
    )
    xs = np.asarray(o[0, 0] + z[0] * d[0, 0])
    n_first = ((xs >= 0.9) & (xs < 2.1)).sum()
    n_second = ((xs >= 3.9) & (xs < 7.1)).sum()
    assert n_first + n_second == 64
    assert abs(n_first - 16) <= 2  # 1/4 of 64


def test_inverse_z_sampling():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    center = jnp.zeros(3)
    size = jnp.full((3,), 4.0)  # exit at t=2
    z, dist, valid = sampling.inverse_z_sampling(o, d, 16, center, size)
    assert bool(valid[0])
    np.testing.assert_allclose(z[0, 0], 2.0, atol=1e-4)
    assert z[0, -1] > 1e5
    assert np.all(np.diff(np.asarray(z[0])) > 0)
    np.testing.assert_allclose(dist[0, -1], 1e-6, atol=1e-9)


def test_cdf_invert_matches_naive():
    """Two-level CDF inversion == the one-shot compare-reduce."""
    from scanerf_tpu.ops.sampling import _cdf_invert

    rng = np.random.RandomState(0)
    for M in (512, 64, 48):  # 48: non-divisible fallback path
        N, S = 33, 17
        cum = np.cumsum(rng.rand(N, M).astype(np.float32) * 0.1, axis=1)
        total = cum[:, -1]
        s = (np.arange(S)[None] * (total[:, None] / S)).astype(np.float32)
        # include exact-tie and beyond-total queries
        s[:, -1] = total * 1.5
        s[:, 0] = cum[:, 3]
        got = np.asarray(
            _cdf_invert(jnp.asarray(cum), jnp.asarray(s), M,
                        two_level=True)
        )
        want = np.clip(
            np.sum(cum[:, None, :] <= s[:, :, None], axis=-1), 0, M - 1
        )
        np.testing.assert_array_equal(got, want)
