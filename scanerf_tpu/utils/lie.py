"""SE(3)/SO(3) Lie algebra and [R|t] pose ops in JAX.

Semantics follow the BARF formulation used by the reference
(``camera.py:11-141``): poses are ``[..., 3, 4]`` world-to-camera matrices
``[R|t]``; exp maps use Taylor-series coefficients

    A(x) = sin(x)/x,  B(x) = (1-cos(x))/x^2,  C(x) = (x-sin(x))/x^3

evaluated as a 10-term polynomial (``camera.py:118-141``). The polynomial
form is kept verbatim: it is numerically identical to the reference for
|theta| <= pi, is branch-free, and differentiates cleanly under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Taylor coefficients (camera.py:118-141)
# ---------------------------------------------------------------------------

# The series contain only even powers of theta, so they are evaluated in
# theta^2 — this keeps exp maps differentiable at theta == 0 (a sqrt/norm
# there would produce NaN gradients under JAX autodiff; torch defines the
# subgradient of norm at 0 as 0, JAX does not).

def _taylor_A2(x2: jax.Array, nth: int = 10) -> jax.Array:
    ans = jnp.zeros_like(x2)
    denom = 1.0
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        ans = ans + (-1) ** i * x2**i / denom
    return ans


def _taylor_B2(x2: jax.Array, nth: int = 10) -> jax.Array:
    ans = jnp.zeros_like(x2)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 1) * (2 * i + 2)
        ans = ans + (-1) ** i * x2**i / denom
    return ans


def _taylor_C2(x2: jax.Array, nth: int = 10) -> jax.Array:
    ans = jnp.zeros_like(x2)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 2) * (2 * i + 3)
        ans = ans + (-1) ** i * x2**i / denom
    return ans


def taylor_A(x: jax.Array, nth: int = 10) -> jax.Array:
    """sin(x)/x as a truncated Taylor series."""
    return _taylor_A2(x * x, nth)


def taylor_B(x: jax.Array, nth: int = 10) -> jax.Array:
    """(1-cos(x))/x^2 as a truncated Taylor series."""
    return _taylor_B2(x * x, nth)


def taylor_C(x: jax.Array, nth: int = 10) -> jax.Array:
    """(x-sin(x))/x^3 as a truncated Taylor series."""
    return _taylor_C2(x * x, nth)


def skew(w: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix (camera.py:110-116)."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    O = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([O, -w2, w1], axis=-1),
            jnp.stack([w2, O, -w0], axis=-1),
            jnp.stack([-w1, w0, O], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# exp / log maps
# ---------------------------------------------------------------------------

def so3_to_SO3(w: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] -> rotation [..., 3, 3] (camera.py:67-74)."""
    wx = skew(w)
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=w.dtype)
    A = _taylor_A2(theta2)
    B = _taylor_B2(theta2)
    return I + A * wx + B * (wx @ wx)


def SO3_to_so3(R: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Rotation [..., 3, 3] -> axis-angle [..., 3] (camera.py:76-82)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))
    theta = jnp.mod(theta, jnp.pi)[..., None, None]
    lnR = 1.0 / (2 * taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    return jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)


def se3_to_SE3(wu: jax.Array) -> jax.Array:
    """Twist [..., 6] (w | u) -> pose [..., 3, 4] (camera.py:84-95)."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=wu.dtype)
    A = _taylor_A2(theta2)
    B = _taylor_B2(theta2)
    C = _taylor_C2(theta2)
    R = I + A * wx + B * (wx @ wx)
    V = I + B * wx + C * (wx @ wx)
    t = V @ u[..., None]
    return jnp.concatenate([R, t], axis=-1)


def SE3_to_se3(Rt: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Pose [..., 3, 4] -> twist [..., 6] (camera.py:97-108)."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=Rt.dtype)
    A = taylor_A(theta)
    B = taylor_B(theta)
    invV = I - 0.5 * wx + (1 - A / (2 * B)) / (theta**2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


# ---------------------------------------------------------------------------
# [R|t] pose algebra (camera.py:11-60)
# ---------------------------------------------------------------------------

def make_pose(R: jax.Array | None = None, t: jax.Array | None = None) -> jax.Array:
    assert R is not None or t is not None
    if R is None:
        t = jnp.asarray(t)
        R = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), (*t.shape[:-1], 3, 3))
    elif t is None:
        R = jnp.asarray(R)
        t = jnp.zeros(R.shape[:-1], dtype=R.dtype)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def invert(pose: jax.Array) -> jax.Array:
    """Invert [..., 3, 4] pose via R^T (camera.py:37-43)."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = (-R_inv @ t)[..., 0]
    return make_pose(R=R_inv, t=t_inv)


def compose_pair(pose_a: jax.Array, pose_b: jax.Array) -> jax.Array:
    """pose_new(x) = pose_b(pose_a(x)) (camera.py:53-60)."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return make_pose(R=R_new, t=t_new)


def compose(pose_list) -> jax.Array:
    pose_new = pose_list[0]
    for p in pose_list[1:]:
        pose_new = compose_pair(pose_new, p)
    return pose_new


# ---------------------------------------------------------------------------
# Coordinate transforms (camera.py:199-215)
# ---------------------------------------------------------------------------

def to_hom(X: jax.Array) -> jax.Array:
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def world2cam(X: jax.Array, pose: jax.Array) -> jax.Array:
    return to_hom(X) @ jnp.swapaxes(pose, -1, -2)


def cam2img(X: jax.Array, K: jax.Array) -> jax.Array:
    return X @ jnp.swapaxes(K, -1, -2)


def img2cam(X: jax.Array, K: jax.Array) -> jax.Array:
    return X @ jnp.swapaxes(jnp.linalg.inv(K), -1, -2)


def cam2world(X: jax.Array, pose: jax.Array) -> jax.Array:
    return to_hom(X) @ jnp.swapaxes(invert(pose), -1, -2)


# ---------------------------------------------------------------------------
# Quaternions (camera.py:144-193)
# ---------------------------------------------------------------------------

def q_to_R(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation [..., 3, 3]."""
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (qc**2 + qd**2), 2 * (qb * qc - qa * qd), 2 * (qa * qc + qb * qd)], -1),
            jnp.stack([2 * (qb * qc + qa * qd), 1 - 2 * (qb**2 + qd**2), 2 * (qc * qd - qa * qb)], -1),
            jnp.stack([2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd), 1 - 2 * (qb**2 + qc**2)], -1),
        ],
        axis=-2,
    )


def R_to_q(R: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rotation -> quaternion (branch-free variant of camera.py:154-178;
    valid away from the trace = -1 singularity)."""
    t = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    r = jnp.sqrt(jnp.maximum(1 + t, 0.0) + eps)
    qa = 0.5 * r
    qb = jnp.sign(R[..., 2, 1] - R[..., 1, 2]) * 0.5 * jnp.sqrt(
        jnp.maximum(1 + R[..., 0, 0] - R[..., 1, 1] - R[..., 2, 2], 0.0) + eps
    )
    qc = jnp.sign(R[..., 0, 2] - R[..., 2, 0]) * 0.5 * jnp.sqrt(
        jnp.maximum(1 - R[..., 0, 0] + R[..., 1, 1] - R[..., 2, 2], 0.0) + eps
    )
    qd = jnp.sign(R[..., 1, 0] - R[..., 0, 1]) * 0.5 * jnp.sqrt(
        jnp.maximum(1 - R[..., 0, 0] - R[..., 1, 1] + R[..., 2, 2], 0.0) + eps
    )
    return jnp.stack([qa, qb, qc, qd], axis=-1)


def q_invert(q: jax.Array) -> jax.Array:
    conj = q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)
    return conj / jnp.sum(q * q, axis=-1, keepdims=True)


def q_product(q1: jax.Array, q2: jax.Array) -> jax.Array:
    a1, b1, c1, d1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    a2, b2, c2, d2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
            a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
            a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
            a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# NDC conversion (camera.py:310-327)
# ---------------------------------------------------------------------------

def convert_ndc(center: jax.Array, ray: jax.Array, K: jax.Array, near: float = 1.0):
    """Shift origins to the near plane and project to NDC (+z forward)."""
    center = center + (near - center[..., 2:]) / ray[..., 2:] * ray
    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    rx, ry, rz = ray[..., 0], ray[..., 1], ray[..., 2]
    scale_x = K[..., 0, 0] / K[..., 0, 2]
    scale_y = K[..., 1, 1] / K[..., 1, 2]
    center_ndc = jnp.stack(
        [scale_x * (cx / cz), scale_y * (cy / cz), 1 - 2 * near / cz], -1
    )
    ray_ndc = jnp.stack(
        [
            scale_x * (rx / rz - cx / cz),
            scale_y * (ry / rz - cy / cz),
            2 * near / cz,
        ],
        -1,
    )
    return center_ndc, ray_ndc


# ---------------------------------------------------------------------------
# Evaluation helpers (camera.py:329-353)
# ---------------------------------------------------------------------------

def rotation_distance(R1: jax.Array, R2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Geodesic angle between rotations (camera.py:329-334)."""
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))


def procrustes_analysis(X0: jax.Array, X1: jax.Array) -> dict:
    """Similarity transform aligning X1 to X0 (camera.py:336-353)."""
    t0 = X0.mean(axis=0, keepdims=True)
    t1 = X1.mean(axis=0, keepdims=True)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = jnp.sqrt((X0c**2).sum(axis=-1).mean())
    s1 = jnp.sqrt((X1c**2).sum(axis=-1).mean())
    U, _, Vh = jnp.linalg.svd((X0c / s0).T @ (X1c / s1), full_matrices=False)
    V = Vh.T
    # Kabsch correction: flip the smallest-singular-value direction when
    # the raw solution is a reflection. (The reference flips the last ROW
    # of R instead, camera.py:350 — a valid rotation but not the optimal
    # alignment; same result in the non-degenerate det>0 case.)
    d = jnp.linalg.det(U @ V.T)
    R = U @ jnp.diag(jnp.stack([1.0 + 0.0 * d, 1.0 + 0.0 * d, d])) @ V.T
    return dict(t0=t0[0], t1=t1[0], s0=s0, s1=s1, R=R)
