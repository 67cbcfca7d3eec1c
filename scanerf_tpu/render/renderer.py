"""Multi-tile inference renderer.

Rebuild of the standalone renderer (``rendering.py`` +
``hashgrid/src/rendering_kernel.cu``). Staged-jit design (SURVEY.md §7.1):
the CUDA version's resumable per-tile DDA marching + fused hash/MLP
megakernel is replaced by

1. a single occupancy-proportional sampling pass over the UNION of tile
   occupancies (the reference instead marches tiles in sorted order with
   a carried ``tracing_idx``/``z_start`` — equivalent sample placement,
   since ``process_occupied_grid`` already unions occupancy across
   overlapping tiles; our sampler queries the union directly),
2. per-sample evaluation under every containing tile with the reference's
   seam-blend weights (distance-to-boundary in x/z, y ignored —
   rendering_kernel.cu:526-537), normalized by the total weight including
   empty-tile contributions (:556-566),
3. front-to-back compositing with persistent transparency
   (``accumulate_color`` :623-702),
4. an inverse-z background pass from the exit tile's (doubled) bbox with
   the L-infinity contraction, blended over exit tiles
   (``update_outgoing_bidx_v2`` :1262-1476, ``bg_pts_inference_v2``).

Tile evaluation is an unrolled loop over tiles (static T) — masked, so
XLA batches all hash+MLP work per tile on the MXU. A fused Pallas
sample->encode->decode kernel replaces stage 2 later (PERF.md).
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.models import decoder as decoder_lib
from scanerf_tpu.ops import integrate
from scanerf_tpu.ops.hash_encode import hash_encode
from scanerf_tpu.ops.intersect import ray_aabb_multi
from scanerf_tpu.train.checkpoint import load_tile_export


@flax.struct.dataclass
class MultiTileScene:
    features: jax.Array  # [T, L, H, F]
    decoders: dict  # stacked decoder pytree, leaves [T, ...]
    resolutions: jax.Array  # [T, L, 3] int32
    block_corner: jax.Array  # [T, 3] DOUBLED bbox corner
    block_size: jax.Array  # [T, 3] DOUBLED bbox size
    occupied: jax.Array  # [T, Rx, Ry, Rz] bool (over inner bboxes)


def _union_occupancy(exports: list[dict]) -> np.ndarray:
    """Cross-tile occupancy union (``process_occupied_grid``,
    rendering_kernel.cu:1478-1564): a voxel occupied in tile A marks the
    covering voxels of every other tile B that contains it."""
    T = len(exports)
    grids = [e["occupied_grid"].copy() for e in exports]
    inner_corner = [
        e["block_corner"] + e["block_size"] / 4.0 for e in exports
    ]
    inner_size = [e["block_size"] / 2.0 for e in exports]
    centers = []
    for a in range(T):
        g = grids[a]
        locs = np.stack(np.nonzero(exports[a]["occupied_grid"]), -1)
        res = np.array(g.shape, np.float64)
        c = inner_corner[a] + (locs + 0.5) / res * inner_size[a]
        centers.append(c)
    for b in range(T):
        res_b = np.array(grids[b].shape)
        for a in range(T):
            if a == b:
                continue
            u = (centers[a] - inner_corner[b]) / inner_size[b]
            inb = np.all((u >= 0) & (u < 1), axis=-1)
            cell = np.clip((u[inb] * res_b).astype(int), 0, res_b - 1)
            grids[b][cell[:, 0], cell[:, 1], cell[:, 2]] = True
    return np.stack(grids)


def load_scene(tile_dirs: list[str], dtype=jnp.float32) -> MultiTileScene:
    exports = [load_tile_export(d) for d in tile_dirs]
    occ = _union_occupancy(exports)
    decoders = [
        decoder_lib.unpack_params(jnp.asarray(e["decoder_params"]))
        for e in exports
    ]
    stacked_dec = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *decoders
    )
    return MultiTileScene(
        features=jnp.asarray(
            np.stack([e["features"] for e in exports])
        ).astype(dtype),
        decoders=stacked_dec,
        resolutions=jnp.asarray(np.stack([e["resolution"] for e in exports])),
        block_corner=jnp.asarray(np.stack([e["block_corner"] for e in exports])),
        block_size=jnp.asarray(np.stack([e["block_size"] for e in exports])),
        occupied=jnp.asarray(occ),
    )


# ---------------------------------------------------------------------------
# sampling over the union of tile occupancies
# ---------------------------------------------------------------------------

def _union_occupancy_lookup(scene: MultiTileScene, pts: jax.Array) -> jax.Array:
    """[..., 3] world points -> bool: occupied in ANY containing tile."""
    T = scene.features.shape[0]
    inner_c = scene.block_corner + scene.block_size / 4.0  # [T, 3]
    inner_s = scene.block_size / 2.0
    res = jnp.array(scene.occupied.shape[1:])
    occ_any = jnp.zeros(pts.shape[:-1], bool)
    for t in range(T):
        u = (pts - inner_c[t]) / inner_s[t]
        inb = jnp.all((u >= 0) & (u < 1), axis=-1)
        cell = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
        occ = scene.occupied[t][cell[..., 0], cell[..., 1], cell[..., 2]]
        occ_any = occ_any | (occ & inb)
    return occ_any


def _sample_union(
    scene: MultiTileScene,
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_sample: int,
    num_march: int,
):
    """CDF sampling against the union occupancy between the first tile
    entry and the last tile exit."""
    inner_c = scene.block_corner + scene.block_size / 4.0
    inner_s = scene.block_size / 2.0
    bounds = ray_aabb_multi(
        rays_o, rays_d, inner_c + inner_s / 2.0, inner_s / 2.0
    )  # [N, T, 2]
    hit = bounds[..., 0] != -1.0
    t_near = jnp.min(jnp.where(hit, bounds[..., 0], jnp.inf), axis=1)
    t_far = jnp.max(jnp.where(hit, bounds[..., 1], -jnp.inf), axis=1)
    any_hit = jnp.any(hit, axis=1)
    t_near = jnp.where(any_hit, t_near, 0.0)
    t_far = jnp.where(any_hit, t_far, 1.0)

    frac = jnp.linspace(0.0, 1.0, num_march + 1, dtype=rays_o.dtype)
    edges = t_near[:, None] + (t_far - t_near)[:, None] * frac[None]
    mids = 0.5 * (edges[:, :-1] + edges[:, 1:])
    pts = rays_o[:, None, :] + mids[..., None] * rays_d[:, None, :]
    occ = _union_occupancy_lookup(scene, pts)  # [N, M]

    seg = (t_far - t_near)[:, None] / num_march
    occ_len = jnp.where(occ, seg, 0.0)
    cum = jnp.cumsum(occ_len, axis=1)
    total = cum[:, -1]
    valid = any_hit & (total > 0)

    j = jnp.arange(num_sample, dtype=rays_o.dtype)
    s = j[None] * (total[:, None] / num_sample)
    seg_idx = jnp.sum((cum[:, None, :] <= s[:, :, None]).astype(jnp.int32), -1)
    seg_idx = jnp.clip(seg_idx, 0, num_march - 1)
    cum_before = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum], 1), seg_idx, 1
    )
    seg_left = jnp.take_along_axis(edges[:, :-1], seg_idx, 1)
    z_vals = seg_left + (s - cum_before)
    dists = jnp.broadcast_to(total[:, None] / num_sample, z_vals.shape)
    z_vals = jnp.where(valid[:, None], z_vals, 0.0)
    dists = jnp.where(valid[:, None], dists, 0.0)
    return z_vals, dists, valid, bounds, hit


# ---------------------------------------------------------------------------
# blended evaluation
# ---------------------------------------------------------------------------

def _seam_weight(u: jax.Array, inner_size: jax.Array) -> jax.Array:
    """rendering_kernel.cu:523-537: world-space distance to boundary in x
    and z (y ignored); product with single-axis fallbacks."""
    dis = (0.5 - jnp.abs(u - 0.5)) * inner_size  # [..., 3]
    dx, dz = dis[..., 0], dis[..., 2]
    w = jnp.where(
        (dx != 0) & (dz != 0), dx * dz, jnp.where(dx != 0, dx, jnp.where(dz != 0, dz, 0.0))
    )
    return w


def _eval_blended(
    scene: MultiTileScene,
    pts: jax.Array,  # [N, S, 3]
    rays_d: jax.Array,  # [N, 3]
    dists: jax.Array,  # [N, S]
    background: bool,
    exit_tile: jax.Array | None = None,  # [N] — bg mode: owning tile per ray
):
    """Per-sample blend over containing tiles: returns (diffuse, specular,
    alpha) [N, S, ...] matching pts_inference (:500-621) / bg variant."""
    T = scene.features.shape[0]
    N, S = pts.shape[:2]
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)  # [N, 1]
    res = jnp.array(scene.occupied.shape[1:])

    acc_d = jnp.zeros((N, S, 3))
    acc_s = jnp.zeros((N, S, 3))
    acc_a = jnp.zeros((N, S))
    acc_w = jnp.zeros((N, S))
    viewdirs = jnp.broadcast_to(rays_d[:, None, :], (N, S, 3))

    for t in range(T):
        corner = scene.block_corner[t]
        size = scene.block_size[t]
        inner_c = corner + size / 4.0
        inner_s = size / 2.0
        if background:
            # bg points belong to their ray's EXIT tile regardless of
            # containment (bg_pts_inference_v2 with L-inf contraction)
            u2 = (pts - corner) / size
            contains = jnp.broadcast_to((exit_tile == t)[:, None], (N, S))
            x = u2 * 4.0 - 2.0
            linf = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-9)
            ratio = (2.0 - 1.0 / linf) / linf
            xc = jnp.where(linf > 1.0, x * ratio, x)
            w = jnp.ones((N, S))
            occ_ok = jnp.ones((N, S), bool)
        else:
            u = (pts - inner_c) / inner_s
            contains = jnp.all((u >= 0) & (u < 1), axis=-1)
            w = _seam_weight(u, inner_s)
            # occupancy of this tile's own grid
            cell = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
            occ_ok = scene.occupied[t][cell[..., 0], cell[..., 1], cell[..., 2]]
            # fg contraction: inner bbox -> [-1, 1]
            xc = u * 2.0 - 1.0

        feats = hash_encode(
            xc.reshape(-1, 3),
            scene.features[t].astype(jnp.float32),
            scene.resolutions[t],
        ).reshape(N, S, -1)
        dec = jax.tree_util.tree_map(lambda x: x[t], scene.decoders)
        out = decoder_lib.apply_decoder(dec, feats, viewdirs, jnp.ones(feats.shape[-1]))

        alpha_t = 1.0 - jnp.exp(-out["sigma"][..., 0] * dists * dnorm)
        spec = out["tint"] * out["specular"]

        m_eval = (contains & occ_ok).astype(jnp.float32)
        m_any = contains.astype(jnp.float32)
        wa = w * alpha_t * m_eval
        acc_d = acc_d + wa[..., None] * out["diffuse"]
        acc_s = acc_s + wa[..., None] * spec
        acc_a = acc_a + wa
        acc_w = acc_w + w * m_any  # empty tiles still count (:556-566)

    wsafe = jnp.maximum(acc_w, 1e-8)
    return acc_d / wsafe[..., None], acc_s / wsafe[..., None], acc_a / wsafe


# ---------------------------------------------------------------------------
# full render
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_sample", "num_bg_sample", "num_march", "invalid_underground"))
def render_rays(
    scene: MultiTileScene,
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_sample: int = 128,
    num_bg_sample: int = 128,
    num_march: int = 512,
    invalid_underground: bool = False,
) -> dict[str, jax.Array]:
    N = rays_o.shape[0]

    # ---- foreground ----
    z_vals, dists, valid, bounds, hit = _sample_union(
        scene, rays_o, rays_d, num_sample, num_march
    )
    pts = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
    diffuse, specular, alpha = _eval_blended(scene, pts, rays_d, dists, False)
    alpha = jnp.where(valid[:, None], alpha, 0.0)

    # accumulate_color semantics (:623-702): diffuse/specular are already
    # alpha-premultiplied by the blend; T *= (1 - alpha) exactly
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((N, 1)), 1.0 - alpha], axis=1), axis=1
    )[:, :-1]
    rgb_fg = jnp.sum(trans[..., None] * (diffuse + specular), axis=1)
    depth_fg = jnp.sum(trans * alpha * z_vals, axis=1)
    T_left = trans[:, -1] * (1.0 - alpha[:, -1])

    # ---- background: blend over exit tiles ----
    # exit tile = the hit tile with the largest doubled-bbox exit t
    bounds2 = ray_aabb_multi(
        rays_o, rays_d,
        scene.block_corner + scene.block_size / 2.0,
        scene.block_size / 2.0,
    )  # [N, T, 2] vs DOUBLED bboxes
    hit2 = bounds2[..., 0] != -1.0
    t_exit = jnp.where(hit2, bounds2[..., 1], -jnp.inf)  # [N, T]
    exit_tile = jnp.argmax(t_exit, axis=1)  # [N]
    exit_t = jnp.max(t_exit, axis=1)
    bg_hit = jnp.any(hit2, axis=1)
    exit_t = jnp.where(bg_hit, exit_t, 0.1)

    tb = jnp.linspace(0.0, 1.0, num_bg_sample)[None]
    z_bg = 1.0 / (
        (1.0 / (exit_t[:, None] + 1e-6)) * (1.0 - tb) + (1.0 / 1e6) * tb
    )
    d_bg = jnp.concatenate(
        [z_bg[:, 1:] - z_bg[:, :-1], jnp.full((N, 1), 1e-6)], axis=1
    )
    pts_bg = rays_o[:, None, :] + z_bg[..., None] * rays_d[:, None, :]
    bdiff, bspec, balpha = _eval_blended(
        scene, pts_bg, rays_d, d_bg, True, exit_tile=exit_tile
    )
    if invalid_underground:
        # suppress bg through the ground plane (hashgrid/__init__.py:287-293)
        inner_cy = scene.block_corner[exit_tile, 1] + scene.block_size[exit_tile, 1] / 4.0
        outgoing = rays_o + exit_t[:, None] * rays_d
        bg_valid = ~(jnp.abs(outgoing[:, 1] - inner_cy) < 1e-4)
        balpha = jnp.where(bg_valid[:, None], balpha, 0.0)
    balpha = jnp.where(bg_hit[:, None], balpha, 0.0)
    btrans = jnp.cumprod(
        jnp.concatenate([jnp.ones((N, 1)), 1.0 - balpha], axis=1), axis=1
    )[:, :-1]
    rgb_bg = jnp.sum(btrans[..., None] * (bdiff + bspec), axis=1)
    depth_bg = jnp.sum(btrans * balpha * z_bg, axis=1)

    rgb = rgb_fg + T_left[:, None] * rgb_bg
    depth = depth_fg + T_left * depth_bg
    return {
        "rgb": jnp.clip(rgb, 0.0, 1.0),
        "depth": depth[:, None],
        "rgb_fg": rgb_fg,
        "T_left": T_left,
        "fore_valid": valid,
    }


def render_image(
    scene: MultiTileScene,
    K: np.ndarray,
    c2w: np.ndarray,
    H: int,
    W: int,
    chunk: int = 2**14,
    **kwargs,
) -> dict[str, np.ndarray]:
    """Full-frame render in chunks (rendering.py:195-270 driver)."""
    from scanerf_tpu.utils import lie, rays as rays_mod

    xy = rays_mod.pixel_grid(H, W)
    pose = np.asarray(lie.invert(jnp.asarray(c2w)))
    rays_o, rays_d = rays_mod.get_center_and_ray(
        xy, jnp.asarray(pose), jnp.asarray(K)
    )
    n = rays_o.shape[0]
    pad = (-n) % chunk
    rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
    rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)), constant_values=1.0)
    outs = {"rgb": [], "depth": []}
    for i in range(0, n + pad, chunk):
        out = render_rays(scene, rays_o[i : i + chunk], rays_d[i : i + chunk], **kwargs)
        outs["rgb"].append(np.asarray(out["rgb"]))
        outs["depth"].append(np.asarray(out["depth"]))
    return {k: np.concatenate(v)[:n].reshape(H, W, -1) for k, v in outs.items()}
