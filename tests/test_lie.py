"""Golden tests for the Lie/pose math vs. closed-form references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanerf_tpu.utils import lie


def rand_twist(key, scale=1.0, n=8):
    return scale * jax.random.normal(key, (n, 6))


def test_taylor_coeffs_match_closed_form():
    x = jnp.linspace(0.0, 3.1, 50)
    np.testing.assert_allclose(lie.taylor_A(x), np.sinc(np.asarray(x) / np.pi), atol=1e-5)
    xs = np.asarray(x)
    B_ref = np.where(xs > 1e-4, (1 - np.cos(xs)) / np.maximum(xs, 1e-8) ** 2, 0.5)
    C_ref = np.where(xs > 1e-4, (xs - np.sin(xs)) / np.maximum(xs, 1e-8) ** 3, 1 / 6)
    np.testing.assert_allclose(lie.taylor_B(x), B_ref, atol=1e-5)
    np.testing.assert_allclose(lie.taylor_C(x), C_ref, atol=1e-5)


def test_so3_exp_is_rotation():
    w = rand_twist(jax.random.PRNGKey(0))[:, :3]
    R = lie.so3_to_SO3(w)
    I = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), I, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_so3_log_roundtrip():
    w = 0.7 * jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    w2 = lie.SO3_to_so3(lie.so3_to_SO3(w))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_se3_roundtrip():
    wu = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (16, 6))
    Rt = lie.se3_to_SE3(wu)
    wu2 = lie.SE3_to_se3(Rt)
    np.testing.assert_allclose(wu2, wu, atol=1e-4)


def test_compose_invert():
    key = jax.random.PRNGKey(3)
    a = lie.se3_to_SE3(0.3 * jax.random.normal(key, (4, 6)))
    b = lie.se3_to_SE3(0.3 * jax.random.normal(jax.random.PRNGKey(4), (4, 6)))
    ab = lie.compose_pair(a, b)
    # apply to points: compose(x) == b(a(x))
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 10, 3))
    y1 = lie.world2cam(lie.world2cam(x, a), b)
    y2 = lie.world2cam(x, ab)
    np.testing.assert_allclose(y1, y2, atol=1e-5)
    # invert
    ident = lie.compose_pair(a, lie.invert(a))
    I = jnp.broadcast_to(jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1), ident.shape)
    np.testing.assert_allclose(ident, I, atol=1e-5)


def test_cam2world_world2cam_roundtrip():
    pose = lie.se3_to_SE3(0.4 * jax.random.normal(jax.random.PRNGKey(6), (2, 6)))
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 3))
    np.testing.assert_allclose(
        lie.cam2world(lie.world2cam(x, pose), pose), x, atol=1e-5
    )


def test_rotation_distance():
    w = jnp.array([[0.3, 0.0, 0.0]])
    R1 = lie.so3_to_SO3(jnp.zeros((1, 3)))
    R2 = lie.so3_to_SO3(w)
    np.testing.assert_allclose(lie.rotation_distance(R1, R2), [0.3], atol=1e-4)


def test_procrustes_identity():
    X = jax.random.normal(jax.random.PRNGKey(8), (20, 3))
    sim3 = lie.procrustes_analysis(X, X)
    np.testing.assert_allclose(sim3["R"], jnp.eye(3), atol=1e-4)
    np.testing.assert_allclose(sim3["s0"], sim3["s1"], atol=1e-5)


def test_procrustes_recovers_similarity():
    key = jax.random.PRNGKey(9)
    X0 = jax.random.normal(key, (30, 3))
    R = lie.so3_to_SO3(jnp.array([0.2, -0.1, 0.4]))
    X1 = 2.0 * X0 @ R.T + jnp.array([1.0, -2.0, 0.5])
    sim3 = lie.procrustes_analysis(X0, X1)
    X1to0 = (X1 - sim3["t1"]) / sim3["s1"] @ sim3["R"].T * sim3["s0"] + sim3["t0"]
    np.testing.assert_allclose(X1to0, X0, atol=1e-4)


def test_pose_eval_exact_recovery_coplanar_safe():
    """evaluate_camera_alignment must report ~0 error for EXACT pose
    recovery, including near-degenerate rigs (the former row-flip
    'reflection fix' produced 180-degree errors on a coplanar circle
    with a zero singular value)."""
    import numpy as np

    from scanerf_tpu.data.synthetic import make_sphere_dataset
    from scanerf_tpu.train import cameras as cam_lib

    for hv in (0.3, 0.0):  # staggered and fully coplanar rigs
        _, _, ks, c2ws = make_sphere_dataset(12, 8, 8, height_variation=hv)
        noise = 0.05 * np.random.RandomState(0).randn(12, 6).astype(np.float32)
        cams = cam_lib.make_cameras(
            jnp.asarray(ks), jnp.asarray(c2ws),
            noise_se3=jnp.asarray(noise), gt_c2ws=jnp.asarray(c2ws),
        )
        corr = lie.compose(
            [lie.invert(jnp.asarray(c2ws)), lie.invert(cams.rts)]
        )
        se3 = lie.SE3_to_se3(corr)
        r, t = cam_lib.evaluate_camera_alignment(cams, se3)
        assert float(r) < 0.1, (hv, float(r))
        assert float(t) < 1e-3, (hv, float(t))
        r0, _ = cam_lib.evaluate_camera_alignment(cams, jnp.zeros((12, 6)))
        assert float(r0) > 1.0, (hv, float(r0))
