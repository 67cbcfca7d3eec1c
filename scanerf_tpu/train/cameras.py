"""Bundle-adjusting camera model.

JAX rebuild of ``camera_utils.py:39-121`` (``CAM``): base world-to-camera
poses (optionally perturbed by se(3) noise), a learnable ``se3_refine``
[N, 6] composed via the exp map, BARF ray generation, and pose-error
evaluation against ground truth via Procrustes pre-alignment.

``se3_refine`` is a *trainable* leaf carried in the train state; the rest
(base poses, intrinsics) is static camera data.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from scanerf_tpu.utils import lie, rays


@flax.struct.dataclass
class Cameras:
    """Static (non-trained) camera data for one tile."""

    ks: jax.Array  # [N, 3, 3]
    rts: jax.Array  # [N, 3, 4] base w2c poses (noise already applied)
    gt_rts: jax.Array  # [N, 3, 4] ground-truth w2c poses


def make_cameras(
    ks: jax.Array,
    c2ws: jax.Array,
    noise_se3: jax.Array | None = None,
    gt_c2ws: jax.Array | None = None,
) -> Cameras:
    """Mirrors ``CAM.__init__`` (camera_utils.py:40-63)."""
    ori_rts = lie.invert(c2ws)
    if noise_se3 is not None:
        rts = lie.compose([lie.se3_to_SE3(noise_se3), ori_rts])
    else:
        rts = ori_rts
    gt_rts = lie.invert(gt_c2ws) if gt_c2ws is not None else ori_rts
    return Cameras(ks=jnp.asarray(ks), rts=rts, gt_rts=gt_rts)


def init_se3_refine(num_camera: int) -> jax.Array:
    return jnp.zeros((num_camera, 6), dtype=jnp.float32)


def get_rts(cams: Cameras, se3_refine: jax.Array) -> jax.Array:
    """Refined w2c poses: exp(se3) o base (camera_utils.py:86-89)."""
    return lie.compose([lie.se3_to_SE3(se3_refine), cams.rts])


def get_rays(
    cams: Cameras,
    se3_refine: jax.Array,
    xy: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Rays for pixel coords per camera.

    Args:
        xy: [B, 2] pixel coords shared across cameras (the reference
            replicates the same patch set over all cameras,
            ``tile.py:915``), or [N, B, 2] per-camera.
    Returns:
        rays_o, rays_d: [N, B, 3]; differentiable w.r.t. se3_refine.
    """
    rts = get_rts(cams, se3_refine)
    return rays.get_center_and_ray(xy, rts, cams.ks)


def prealign_cameras(pose: jax.Array, pose_gt: jax.Array):
    """Procrustes pre-alignment of camera centers (camera_utils.py:11-27)."""
    center = jnp.zeros((1, 3))
    center_pred = lie.cam2world(center, pose)[:, 0]
    center_gt = lie.cam2world(center, pose_gt)[:, 0]
    sim3 = lie.procrustes_analysis(center_gt, center_pred)
    center_aligned = (
        (center_pred - sim3["t1"]) / sim3["s1"] @ sim3["R"].T * sim3["s0"]
        + sim3["t0"]
    )
    R_aligned = pose[..., :3] @ sim3["R"].T
    t_aligned = (-R_aligned @ center_aligned[..., None])[..., 0]
    return lie.make_pose(R=R_aligned, t=t_aligned), sim3


def evaluate_camera_alignment(
    cams: Cameras, se3_refine: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(mean rotation error deg, mean translation error)
    — camera_utils.py:29-37, 115-121."""
    rts = get_rts(cams, se3_refine)
    aligned, _ = prealign_cameras(rts, cams.gt_rts)
    R_err = lie.rotation_distance(aligned[..., :3], cams.gt_rts[..., :3])
    t_err = jnp.linalg.norm(aligned[..., 3] - cams.gt_rts[..., 3], axis=-1)
    return jnp.rad2deg(R_err.mean()), t_err.mean()
