"""Training losses: RGB, monocular depth priors, multi-view warp, ADMM.

JAX rebuilds of ``criterions.py``, ``mono_loss.py`` and ``warp_loss.py``.
Everything runs inside jit with static shapes: boolean ray compression is
replaced by masked reductions whose denominators match the reference's
(mean over *selected* rays).

Weight schedules (``criterions.py:13-22``):
- warp warm-up: w * clip(step/1e4, 0, 1),
- depth / smooth decay: w * 0.1**(step/3e4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scanerf_tpu.utils import lie


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """sum(x * mask) / sum(mask), 0 when mask is empty (Mask_MSELoss
    denominator convention, ``tools/utils.py:274-279``)."""
    denom = jnp.sum(mask)
    return jnp.sum(x * mask) / jnp.maximum(denom, 1.0)


# ---------------------------------------------------------------------------
# RGB
# ---------------------------------------------------------------------------

def rgb_loss(pred: jax.Array, target: jax.Array, valid: jax.Array) -> jax.Array:
    """MSE over valid rays (``criterions.py:137-144``: nn.MSELoss on the
    boolean-selected rays = mean over rays and channels)."""
    per_ray = jnp.mean((pred - target) ** 2, axis=-1)
    return masked_mean(per_ray, valid.astype(per_ray.dtype))


# ---------------------------------------------------------------------------
# Monocular depth consistency (mono_loss.py:8-52)
# ---------------------------------------------------------------------------

def compute_scale_and_shift(
    prediction: jax.Array, target: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Closed-form per-camera least squares (MiDaS; mono_loss.py:10-30).

    Shapes: [N, B, 1]; returns ([N], [N]).
    """
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))
    det = a_00 * a_11 - a_01 * a_01
    safe_det = jnp.where(det != 0, det, 1.0)
    x_0 = jnp.where(det != 0, (a_11 * b_0 - a_01 * b_1) / safe_det, 0.0)
    x_1 = jnp.where(det != 0, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    return x_0, x_1


def depth_consistency_loss(
    rendered_depth: jax.Array, monocular_depth: jax.Array, mask: jax.Array
) -> jax.Array:
    """Scale/shift-aligned masked MSE (mono_loss.py:38-52)."""
    h0, h1 = compute_scale_and_shift(rendered_depth, monocular_depth, mask)
    scaled = rendered_depth * h0[:, None, None] + h1[:, None, None]
    return masked_mean((scaled - monocular_depth) ** 2, mask)


# ---------------------------------------------------------------------------
# Depth smoothness vs mono normals (mono_loss.py:55-106)
# ---------------------------------------------------------------------------

def _normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def depth_smooth_loss(
    ks: jax.Array,
    pixel_locs: jax.Array,
    rendered_depth: jax.Array,
    monocular_normal: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """2x2-patch depth-gradient vs mono-normal orthogonality.

    Shapes: ks [N,3,3], pixel_locs [N,B,2], rendered_depth [N,B,1],
    monocular_normal [N,B,3], mask [N,B,1]; B = 4 * num_patches.
    """
    N = ks.shape[0]
    locs_h = jnp.concatenate(
        [pixel_locs.astype(rendered_depth.dtype), jnp.ones_like(pixel_locs[..., :1], dtype=rendered_depth.dtype)],
        axis=-1,
    )
    k_inv = jnp.linalg.inv(ks)
    pts_cam = jnp.einsum("nij,nbj->nbi", k_inv, locs_h) * rendered_depth
    pts_cam = pts_cam.reshape(N, -1, 2, 2, 3)
    normal = monocular_normal.reshape(N, -1, 2, 2, 3)
    m = mask.reshape(N, -1, 4)

    mean_normal = jnp.mean(normal, axis=(2, 3))
    sim = jnp.sum(normal * mean_normal[:, :, None, None, :], axis=-1)
    valid = jnp.all(sim.reshape(N, -1, 4) > 0.9, axis=-1) & jnp.all(m, axis=-1)

    mean_n = _normalize(mean_normal)
    grad_y = _normalize(pts_cam[:, :, 1, :, :] - pts_cam[:, :, 0, :, :])
    grad_x = _normalize(pts_cam[:, :, :, 1, :] - pts_cam[:, :, :, 0, :])
    cos = 0.5 * jnp.mean(
        jnp.abs(jnp.sum(mean_n[:, :, None, :] * grad_y, axis=-1)), axis=-1
    ) + 0.5 * jnp.mean(
        jnp.abs(jnp.sum(mean_n[:, :, None, :] * grad_x, axis=-1)), axis=-1
    )
    return masked_mean(cos, valid.astype(cos.dtype))


# ---------------------------------------------------------------------------
# Warp loss (warp_loss.py)
# ---------------------------------------------------------------------------

def view_cost(
    pts: jax.Array,
    rays_o: jax.Array,
    rays_d: jax.Array,
    ks: jax.Array,
    rts: jax.Array,
    H: int,
    W: int,
    gamma: float = 0.1,
) -> jax.Array:
    """Per-(camera, ray) selection cost (view_selection_kernel.cu:18-112).

    cost = 0.9*(1 - cos(ray, neighbor ray)) + 0.1*max(0, 1 - d_ref/d_nei);
    1.0 when behind the camera or projecting out of frame.

    Returns [N_cam, B].
    """
    # camera centers: -R^T t
    R, t = rts[..., :3], rts[..., 3]
    centers = -jnp.einsum("nij,ni->nj", R, t)  # [N, 3]

    x_cam = jnp.einsum("nij,bj->nbi", R, pts) + t[:, None, :]  # [N, B, 3]
    uvz = jnp.einsum("nij,nbj->nbi", ks, x_cam)
    z = uvz[..., 2]
    x = uvz[..., 0] / jnp.where(z == 0, 1.0, z)
    y = uvz[..., 1] / jnp.where(z == 0, 1.0, z)
    out_of_view = (z <= 0.001) | (x <= 0) | (x >= W - 1) | (y <= 0) | (y >= H - 1)

    direction = _normalize(rays_d)[None]  # [1, B, 3]
    nei_dir = _normalize(pts[None] - centers[:, None, :])  # [N, B, 3]
    angle_cost = 1.0 - jnp.sum(direction * nei_dir, axis=-1)
    d_ref = jnp.linalg.norm(pts[None] - rays_o[None], axis=-1)
    d_nei = jnp.maximum(jnp.linalg.norm(pts[None] - centers[:, None, :], axis=-1), 1e-8)
    dis_cost = jnp.maximum(0.0, 1.0 - d_ref / d_nei)
    cost = (1.0 - gamma) * angle_cost + gamma * dis_cost
    return jnp.where(out_of_view, 1.0, cost)


def view_selection(
    pts: jax.Array,
    rays_o: jax.Array,
    rays_d: jax.Array,
    ks: jax.Array,
    rts: jax.Array,
    H: int,
    W: int,
    top_k: int = 10,
    cost_thresh: float = 0.176,
) -> tuple[jax.Array, jax.Array]:
    """Top-K lowest-cost neighbor views per ray (warp_loss.py:389-413).

    Returns (nei_views [B, K] int32, nei_valid [B, K] bool). No gradients.
    """
    cost = jax.lax.stop_gradient(
        view_cost(pts, rays_o, rays_d, ks, rts, H, W)
    )  # [N, B]
    neg_topk, idx = jax.lax.top_k(-cost.T, top_k)  # over cameras, [B, K]
    topk_cost = -neg_topk
    return idx.astype(jnp.int32), topk_cost <= cost_thresh


def project_to_neighbors(
    pts: jax.Array,
    ks: jax.Array,
    rts: jax.Array,
    nei_views: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Differentiable projection to neighbor views (warp_loss.py:415-439 /
    view_selection_kernel.cu:115-213), grads flow to pts AND poses.

    Returns grid [B,K,2] (pixel coords, BARF -0.5 applied), nei_origin
    [B,K,3], nei_direction [B,K,3] (unit-z camera ray through the point,
    world frame, stop-gradient), proj_depth [B,K,1] (stop-gradient).
    """
    rts_k = rts[nei_views]  # [B, K, 3, 4]
    ks_k = ks[nei_views]  # [B, K, 3, 3]
    R, t = rts_k[..., :3], rts_k[..., 3]
    x_cam = jnp.einsum("bkij,bj->bki", R, pts) + t  # [B, K, 3]
    uvz = jnp.einsum("bkij,bkj->bki", ks_k, x_cam)
    z = uvz[..., 2:]
    grid = uvz[..., :2] / (z + 1e-8) - 0.5  # BARF +0.5 center removed

    centers = -jnp.einsum("bkij,bki->bkj", R, t)  # [B, K, 3]
    dir_cam = x_cam / (x_cam[..., 2:] + 1e-8)
    nei_direction = jnp.einsum("bkij,bki->bkj", R, dir_cam)  # R^T d
    return (
        grid,
        jax.lax.stop_gradient(centers),
        jax.lax.stop_gradient(nei_direction),
        jax.lax.stop_gradient(z),
    )


def sample_neighbor_color(
    grid: jax.Array,
    nei_views: jax.Array,
    nei_valid: jax.Array,
    images: jax.Array,
    occlusions: jax.Array | None,
) -> tuple[jax.Array, jax.Array]:
    """Manual bilinear fetch; corner colors stop-gradient, weights
    differentiable w.r.t. grid (warp_loss.py:441-519). Images live on
    device — the reference's CPU gather round-trip is gone.

    images: [N, H, W, 3]; occlusions: [N, H, W] bool or None.
    """
    H, W = images.shape[1:3]
    lt = jnp.floor(grid).astype(jnp.int32)  # [B, K, 2] (x, y)
    offset = grid - lt.astype(grid.dtype)
    nearest = jnp.floor(grid + 0.5).astype(jnp.int32)

    def fetch(ix, iy):
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        return jax.lax.stop_gradient(images[nei_views, iyc, ixc])

    lt_c = fetch(lt[..., 0], lt[..., 1])
    rt_c = fetch(lt[..., 0] + 1, lt[..., 1])
    lb_c = fetch(lt[..., 0], lt[..., 1] + 1)
    rb_c = fetch(lt[..., 0] + 1, lt[..., 1] + 1)

    ox, oy = offset[..., 0:1], offset[..., 1:2]
    color = (
        (1 - ox) * (1 - oy) * lt_c
        + ox * (1 - oy) * rt_c
        + (1 - ox) * oy * lb_c
        + ox * oy * rb_c
    )

    inb = (
        (lt[..., 0] >= 0)
        & (lt[..., 0] + 1 <= W - 1)
        & (lt[..., 1] >= 0)
        & (lt[..., 1] + 1 <= H - 1)
    )
    valid = nei_valid & inb
    if occlusions is not None:
        nx = jnp.clip(nearest[..., 0], 0, W - 1)
        ny = jnp.clip(nearest[..., 1], 0, H - 1)
        valid = valid & occlusions[nei_views, ny, nx]
    return color, valid


def soft_vis(depth_diff: jax.Array, alpha: float, voxel_size: float) -> jax.Array:
    """exp(-alpha * |depth diff| / voxel) (warp_loss.py:221-222)."""
    return jnp.exp(-alpha * depth_diff / voxel_size)


def soft_diffuse(specular: jax.Array, gamma: float) -> jax.Array:
    """exp(-gamma * mean(specular)) (warp_loss.py:224-230)."""
    return jnp.exp(-gamma * jnp.mean(specular, axis=-1, keepdims=True))


def warp_loss_value(
    pred_color: jax.Array,
    neighbor_color: jax.Array,
    warping_score: jax.Array,
    ray_valid: jax.Array,
    top_k: int,
) -> jax.Array:
    """Final weighted MSE (warp_loss.py:332-337, 656-658): mean over
    (valid rays x K); invalid neighbors contribute 0 but still count in
    the denominator, matching the reference."""
    mse = jnp.mean((pred_color[:, None, :] - neighbor_color) ** 2, axis=-1, keepdims=True)
    num = jnp.sum(mse * warping_score * ray_valid[:, None, None])
    denom = jnp.maximum(jnp.sum(ray_valid.astype(mse.dtype)), 1.0) * top_k
    return num / denom


# ---------------------------------------------------------------------------
# ADMM consensus penalty (consensus.py:70-76)
# ---------------------------------------------------------------------------

def admm_penalty(
    se3_refine: jax.Array,
    shared_se3: jax.Array,
    delta_se3: jax.Array,
    overlap_flags: jax.Array,
    rho: jax.Array,
) -> jax.Array:
    """mean over the selected [n_overlap, 6] block, exactly
    torch.mean(rho * constrain[overlap_flags])."""
    constrain = (se3_refine - shared_se3 + delta_se3) ** 2
    weighted = rho[None, :] * constrain  # [N, 6]
    mask = overlap_flags.astype(weighted.dtype)  # [N]
    denom = jnp.maximum(jnp.sum(mask) * 6.0, 1.0)
    return jnp.sum(weighted * mask[:, None]) / denom


# ---------------------------------------------------------------------------
# schedules (criterions.py:13-22)
# ---------------------------------------------------------------------------

def warp_warmup(weight: float, step: jax.Array) -> jax.Array:
    return weight * jnp.clip(step / 10000.0, 0.0, 1.0)


def depth_weight_decay(weight: float, step: jax.Array) -> jax.Array:
    return weight * 0.1 ** (step / 30000.0)
