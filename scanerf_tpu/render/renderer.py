"""Multi-tile inference renderer.

Rebuild of the standalone renderer (``rendering.py`` +
``hashgrid/src/rendering_kernel.cu``). Two backends behind one
``render_rays`` API:

**Staged** (``backend="xla"``): per-tile unrolled evaluation — the parity
oracle. **Windowed** (``backend="windowed"``, default when the tiles were
trained with the windowed hash layout): the TPU production path — the
per-sample work is capped at ``MAX_PTS_BLOCKS=4`` containing tiles
(``prepare_points``, rendering_kernel.cu:390-449), all (sample, tile)
slots of the fg AND bg passes are merged into ONE sorted stream through
the Pallas windowed hash kernel (``ops/pallas/hash_encode.py``), and the
ShallowMLP decoder runs in the sorted stream as per-chunk batched MXU
matmuls (each 1024-sample chunk lies inside one tile because tile
boundaries coincide with window-block boundaries, so its decoder params
are a single gather per chunk). This replaces the reference's fused
``pts_inference`` megakernel (rendering_kernel.cu:466-621).

Shared semantics in both backends:

1. a single occupancy-proportional sampling pass over the UNION of tile
   occupancies (the reference instead marches tiles in sorted order with
   a carried ``tracing_idx``/``z_start`` — equivalent sample placement,
   since ``process_occupied_grid`` already unions occupancy across
   overlapping tiles; our sampler queries the union directly),
2. per-sample seam-blend weights (distance-to-boundary in x/z, y ignored
   — rendering_kernel.cu:526-537), normalized by the total weight
   including empty-tile contributions (:556-566),
3. front-to-back compositing with persistent transparency
   (``accumulate_color`` :623-702),
4. multi-exit-tile background blending (``update_outgoing_bidx``
   :1262-1380 with skip=False as called from rendering.py:443-444):
   walk tiles in entry order tracking the running max exit ``far``
   (break on a disconnected gap), collect the <=4 tiles whose exit
   equals ``far``, weight each by the x/z boundary distance of the
   outgoing point, composite each tile's inverse-z background
   separately and blend the composited colors.
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.models import decoder as decoder_lib
from scanerf_tpu.ops.hash_encode import hash_encode
from scanerf_tpu.ops.intersect import ray_aabb_multi
from scanerf_tpu.train.checkpoint import load_tile_export

MAX_PTS_BLOCKS = 4  # rendering_kernel.cu:25


@flax.struct.dataclass
class MultiTileScene:
    features: jax.Array  # [T, L, H, F]
    decoders: dict  # stacked decoder pytree, leaves [T, ...]
    resolutions: jax.Array  # [T, L, 3] int32
    block_corner: jax.Array  # [T, 3] DOUBLED bbox corner
    block_size: jax.Array  # [T, 3] DOUBLED bbox size
    occupied: jax.Array  # [T, Rx, Ry, Rz] bool (over inner bboxes)
    # ONE scene-wide occupancy grid over the union of inner bboxes
    # (process_occupied_grid makes the per-tile grids agree wherever
    # tiles overlap, so a single global rasterization answers every
    # per-sample query with one gather instead of T)
    union_occ: jax.Array  # [Gx, Gy, Gz] bool
    union_corner: jax.Array  # [3]
    union_size: jax.Array  # [3]
    # "global" = reference prime-XOR hash; "windowed" = hierarchical
    # window layout (tiles trained with hash_backend="windowed")
    hash_layout: str = flax.struct.field(pytree_node=False, default="global")
    # all tiles share one resolution ladder (true for build_tiles grids —
    # equal tile sizes); required by the windowed fast path
    shared_res: bool = flax.struct.field(pytree_node=False, default=True)
    # rasterized containing-tile LUT (build_tile_lut): per scene cell, up
    # to LUT_CAND candidate tile ids (-1 pad). Makes fg slot assignment
    # O(candidates) instead of O(T) — the capped-slot renderer's cost
    # then no longer grows with the city-scale tile count. None falls
    # back to the exhaustive per-tile loop.
    tile_lut: jax.Array | None = None  # [Gx*Gy*Gz, LUT_CAND] int32
    lut_corner: jax.Array | None = None  # [3]
    lut_cell: jax.Array | None = None  # [3]
    lut_dims: tuple | None = flax.struct.field(
        pytree_node=False, default=None
    )
    # windowed fast path: the SAME tables pre-laid-out as [L, T*H, F]
    # (tile-major per level). Built ONCE on the host at scene load —
    # doing `features.transpose(1,0,2,3)` inside the jitted render is a
    # full-table copy per chunk, and XLA's T(2,128) layout for the
    # trailing F=2 dim pads it 8x (measured: 16 GB for 2 GB of tables at
    # T=32, an instant OOM). None falls back to the in-graph transpose.
    features_flat: jax.Array | None = None  # flat [L, T*H*F] (no pad layout)


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


def build_union_grid(
    block_corner: np.ndarray,  # [T, 3] DOUBLED corners
    block_size: np.ndarray,  # [T, 3]
    occupied: np.ndarray,  # [T, Rx, Ry, Rz]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rasterize per-tile occupancy into one scene-wide grid at the
    tiles' cell pitch. Returns (grid, corner, size). Host-side, once per
    scene load — the same re-rasterization across mutually-misaligned
    grids that ``process_occupied_grid`` performs tile-to-tile."""
    T = occupied.shape[0]
    inner_c = (block_corner + block_size / 4.0).astype(np.float64)
    inner_s = (block_size / 2.0).astype(np.float64)
    res = np.array(occupied.shape[1:], np.float64)
    resi = res.astype(np.int64)
    cell = (inner_s / res).min(axis=0)  # finest pitch per axis
    lo = inner_c.min(axis=0)
    hi = (inner_c + inner_s).max(axis=0)
    G = np.maximum(np.ceil((hi - lo) / cell - 1e-6).astype(np.int64), 1)
    occ = np.zeros(tuple(G), bool)
    # fill each tile's sub-box only (tile-size bounded) — a dense global
    # center list is O(Gx*Gy*Gz) host memory and blows up at city scale
    for t in range(T):
        i0 = np.clip(
            np.floor((inner_c[t] - lo) / cell).astype(np.int64), 0, G - 1
        )
        i1 = np.clip(
            np.ceil((inner_c[t] + inner_s[t] - lo) / cell).astype(np.int64),
            0, G,
        )
        axes = [
            lo[d] + (np.arange(i0[d], i1[d]) + 0.5) * cell[d] for d in range(3)
        ]
        # per-axis tile-cell indices of the sub-box centers
        ui = [
            (np.asarray(axes[d]) - inner_c[t][d]) / inner_s[t][d]
            for d in range(3)
        ]
        inb = [
            (ui[d] >= 0) & (ui[d] < 1) for d in range(3)
        ]
        ci = [
            np.clip((ui[d] * res[d]).astype(np.int64), 0, resi[d] - 1)
            for d in range(3)
        ]
        sub = occupied[t][np.ix_(ci[0], ci[1], ci[2])]
        sub &= inb[0][:, None, None] & inb[1][None, :, None] & inb[2][None, None, :]
        occ[i0[0]:i1[0], i0[1]:i1[1], i0[2]:i1[2]] |= sub
    return occ, lo.astype(np.float32), (G * cell).astype(np.float32)


def flatten_tables(features: np.ndarray) -> np.ndarray:
    """[T, L, H, F] -> FLAT [L, T*H*F] tile-major per level, host-side.

    Flat 2D, not [L, T*H, F]: any trailing F=2 array materialized by XLA
    gets a T(2,128) layout with 8x padding — at T=32 that was a 16 GB
    copy of 2 GB of tables (the round-3 T=32 bench OOM). The kernels'
    _features_tiled accepts the flat form directly."""
    T, L, H, F = features.shape
    return np.ascontiguousarray(
        np.transpose(np.asarray(features), (1, 0, 2, 3))
    ).reshape(L, T * H * F)


def list_tile_dirs(logdir: str) -> list[str]:
    """``tile-<id>`` export dirs under a run dir, sorted by NUMERIC id.

    A lexicographic sort puts tile-10 before tile-2 at >=10 tiles, which
    would silently mispair the stacked decoders with the spatial tile
    ids the windowed renderer derives from window geometry."""
    import glob as _glob
    import os as _os

    dirs = _glob.glob(_os.path.join(logdir, "tile-*"))
    return sorted(dirs, key=lambda d: int(d.rsplit("-", 1)[1]))


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
    layouts = {e.get("hash_layout", "global") for e in exports}
    assert len(layouts) == 1, f"mixed hash layouts in scene: {layouts}"
    res = np.stack([e["resolution"] for e in exports])
    corners = np.stack([e["block_corner"] for e in exports])
    sizes = np.stack([e["block_size"] for e in exports])
    ug, uc, us = build_union_grid(corners, sizes, occ)
    lut, lc, lcell, ldims = build_tile_lut(corners, sizes)
    return MultiTileScene(
        tile_lut=jnp.asarray(lut),
        lut_corner=jnp.asarray(lc),
        lut_cell=jnp.asarray(lcell),
        lut_dims=ldims,
        features=jnp.asarray(
            np.stack([e["features"] for e in exports])
        ).astype(dtype),
        features_flat=jnp.asarray(
            flatten_tables(np.stack([e["features"] for e in exports]))
        ).astype(dtype),
        decoders=stacked_dec,
        resolutions=jnp.asarray(res),
        block_corner=jnp.asarray(corners),
        block_size=jnp.asarray(sizes),
        occupied=jnp.asarray(occ),
        union_occ=jnp.asarray(ug),
        union_corner=jnp.asarray(uc),
        union_size=jnp.asarray(us),
        hash_layout=layouts.pop(),
        shared_res=bool((res == res[:1]).all()),
    )


def _tile_encode(scene: MultiTileScene, t: int, x: jax.Array) -> jax.Array:
    """Layout-dispatched hash encode of [-2,2] coords under tile t."""
    feats = scene.features[t].astype(jnp.float32)
    if scene.hash_layout == "windowed":
        from scanerf_tpu.ops.pallas.hash_encode import hash_encode_windowed_ref

        return hash_encode_windowed_ref(x, feats, scene.resolutions[t])
    return hash_encode(x, feats, scene.resolutions[t])


# ---------------------------------------------------------------------------
# sampling over the union of tile occupancies
# ---------------------------------------------------------------------------

def _union_occupancy_lookup(scene: MultiTileScene, pts: jax.Array) -> jax.Array:
    """[..., 3] world points -> bool: occupied in the scene-wide union
    grid (ONE gather per point instead of one per tile)."""
    G = jnp.array(scene.union_occ.shape)
    u = (pts - scene.union_corner) / scene.union_size
    inb = jnp.all((u >= 0) & (u < 1), axis=-1)
    cell = jnp.clip((u * G).astype(jnp.int32), 0, G - 1)
    occ = scene.union_occ[cell[..., 0], cell[..., 1], cell[..., 2]]
    return occ & inb


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

    # shared CDF core (fused Pallas sampler on TPU when the union grid
    # fits the kernel's bitpacked LUT — ops/pallas/sampler.py)
    from scanerf_tpu.ops.sampling import cdf_sample_from_bounds

    z_vals, total = cdf_sample_from_bounds(
        rays_o, rays_d, t_near, t_far, num_sample, scene.union_occ,
        scene.union_corner, scene.union_size, num_march,
    )
    valid = any_hit & (total > 0)
    dists = jnp.broadcast_to(total[:, None] / num_sample, z_vals.shape)
    z_vals = jnp.where(valid[:, None], z_vals, 0.0)
    dists = jnp.where(valid[:, None], dists, 0.0)
    return z_vals, dists, valid


# ---------------------------------------------------------------------------
# slot assignment: fg containing tiles, bg exit tiles
# ---------------------------------------------------------------------------

LUT_CAND = 8  # max tiles intersecting one LUT cell (2x2x2 grid corner)


def build_tile_lut(
    block_corner: np.ndarray, block_size: np.ndarray, cells_per_tile: int = 8
):
    """Rasterized containing-tile lookup over the scene's INNER bboxes.

    Cells are sized ~1/cells_per_tile of the smallest tile edge, so a
    cell never straddles more than the 0.2-overlap corner regions —
    at most 8 tiles of an axis-aligned tile grid intersect one cell.
    Returns (lut [Gx*Gy*Gz, LUT_CAND] int32 with -1 padding, corner [3],
    cell [3], dims). Host-side, once per scene load.

    Replaces the renderer's per-tile containment loop (O(T) compile and
    memory) with an O(LUT_CAND) candidate check — the TPU analog of
    ``prepare_points``' encounter-order tile walk
    (rendering_kernel.cu:390-449), which also touches only the tiles a
    sample can lie in.
    """
    T = block_corner.shape[0]
    inner_c = (block_corner + block_size / 4.0).astype(np.float64)
    inner_s = (block_size / 2.0).astype(np.float64)
    lo = inner_c.min(axis=0)
    hi = (inner_c + inner_s).max(axis=0)
    cell = inner_s.min(axis=0) / cells_per_tile
    dims = np.maximum(np.ceil((hi - lo) / cell - 1e-9).astype(np.int64), 1)
    lut = np.full((int(np.prod(dims)), LUT_CAND), -1, np.int32)
    counts = np.zeros(int(np.prod(dims)), np.int64)
    for t in range(T):
        i0 = np.clip(
            np.floor((inner_c[t] - lo) / cell).astype(np.int64), 0, dims - 1
        )
        i1 = np.clip(
            np.ceil((inner_c[t] + inner_s[t] - lo) / cell + 1e-9
                    ).astype(np.int64),
            1, dims,
        )
        gx, gy, gz = np.meshgrid(
            np.arange(i0[0], i1[0]), np.arange(i0[1], i1[1]),
            np.arange(i0[2], i1[2]), indexing="ij",
        )
        flat = (gx * dims[1] + gy) * dims[2] + gz
        flat = flat.reshape(-1)
        n = counts[flat]
        if (n >= LUT_CAND).any():
            raise ValueError(
                f"tile layout has >{LUT_CAND} tiles overlapping one "
                "LUT cell; raise cells_per_tile")
        lut[flat, n] = t
        counts[flat] = n + 1
    return lut, lo.astype(np.float32), cell.astype(np.float32), tuple(
        int(d) for d in dims
    )


def _fg_slots_lut(scene: MultiTileScene, pts: jax.Array, K: int):
    """O(LUT_CAND) fg slot assignment via the rasterized tile LUT —
    same outputs as ``_fg_slots`` (tested equal), compile size and
    per-sample work independent of the tile count."""
    dims = jnp.asarray(scene.lut_dims)
    u = (pts - scene.lut_corner) / scene.lut_cell
    cell = jnp.clip(u.astype(jnp.int32), 0, dims - 1)
    flat = (cell[..., 0] * scene.lut_dims[1] + cell[..., 1]) \
        * scene.lut_dims[2] + cell[..., 2]
    cand = scene.tile_lut[flat]  # [N, S, LUT_CAND]
    cand_safe = jnp.maximum(cand, 0)
    inner_c = (scene.block_corner + scene.block_size / 4.0)[cand_safe]
    inner_s = (scene.block_size / 2.0)[cand_safe]  # [N, S, C, 3]
    uu = (pts[..., None, :] - inner_c) / inner_s
    contains = jnp.all((uu >= 0) & (uu < 1), axis=-1) & (cand >= 0)
    w_all = _seam_weight(uu, inner_s)  # [N, S, C]
    occ_any = _union_occupancy_lookup(scene, pts)  # [N, S]
    score = jnp.where(contains, w_all, -1.0)
    top, sel = jax.lax.top_k(score, K)  # over C candidates
    tags = jnp.take_along_axis(cand_safe, sel, -1)
    w = jnp.take_along_axis(w_all, sel, -1)
    m_any = jnp.take_along_axis(contains, sel, -1)
    m_eval = m_any & occ_any[..., None]
    return tags, jnp.where(m_any, w, 0.0), m_any, m_eval

def _seam_weight(u: jax.Array, inner_size: jax.Array) -> jax.Array:
    """rendering_kernel.cu:523-537: world-space distance to boundary in x
    and z (y ignored); product with single-axis fallbacks."""
    dis = (0.5 - jnp.abs(u - 0.5)) * inner_size  # [..., 3]
    dx, dz = dis[..., 0], dis[..., 2]
    w = jnp.where(
        (dx != 0) & (dz != 0), dx * dz, jnp.where(dx != 0, dx, jnp.where(dz != 0, dz, 0.0))
    )
    return w


def _fg_slots(scene: MultiTileScene, pts: jax.Array, K: int):
    """Per-sample <=K containing-tile tags (``prepare_points``,
    rendering_kernel.cu:390-449; slots picked by seam weight instead of
    encounter order — identical when <=K tiles overlap).

    pts [N, S, 3]. Returns (tags [N,S,K] int32, w [N,S,K], m_any
    [N,S,K] bool containment, m_eval [N,S,K] bool containment &
    occupancy). Occupancy queries the scene-wide union grid once per
    SAMPLE: after ``process_occupied_grid`` all containing tiles agree
    on a point's occupancy, so the per-tile gather is redundant."""
    T = scene.features.shape[0]
    inner_c = scene.block_corner + scene.block_size / 4.0
    inner_s = scene.block_size / 2.0
    w_all, c_all = [], []
    for t in range(T):
        u = (pts - inner_c[t]) / inner_s[t]
        contains = jnp.all((u >= 0) & (u < 1), axis=-1)
        w_all.append(_seam_weight(u, inner_s[t]))
        c_all.append(contains)
    w_all = jnp.stack(w_all, -1)  # [N, S, T]
    c_all = jnp.stack(c_all, -1)
    occ_any = _union_occupancy_lookup(scene, pts)  # [N, S]
    score = jnp.where(c_all, w_all, -1.0)
    _, tags = jax.lax.top_k(score, K)  # [N, S, K]
    w = jnp.take_along_axis(w_all, tags, -1)
    m_any = jnp.take_along_axis(c_all, tags, -1)
    m_eval = m_any & occ_any[..., None]
    return tags, jnp.where(m_any, w, 0.0), m_any, m_eval


def _exit_slots(scene: MultiTileScene, rays_o: jax.Array, rays_d: jax.Array, K: int):
    """Background exit-tile slots (``update_outgoing_bidx`` with
    skip=False, rendering_kernel.cu:1262-1380): walk tiles in entry
    order over the DOUBLED bboxes, track the running max exit ``far``
    (stop at a disconnected gap), collect tiles whose exit equals
    ``far``, weight by x/z boundary distance of the outgoing point.

    Returns (tiles [N,K] int32, w [N,K] normalized, far [N], bg_valid [N])."""
    bounds = ray_aabb_multi(
        rays_o, rays_d,
        scene.block_corner + scene.block_size / 2.0,
        scene.block_size / 2.0,
    )  # [N, T, 2]
    hit = bounds[..., 0] != -1.0
    tn = jnp.where(hit, bounds[..., 0], jnp.inf)
    tf = jnp.where(hit, bounds[..., 1], -jnp.inf)
    order = jnp.argsort(tn, axis=1)  # entry order (INF_INTERSECTION last)
    tn_s = jnp.take_along_axis(tn, order, 1)
    tf_s = jnp.take_along_axis(tf, order, 1)
    hit_s = jnp.take_along_axis(hit, order, 1)

    def step(carry, xs):
        far, alive = carry
        tni, tfi, hi = xs
        ok = hi & alive & ((far == -jnp.inf) | (tni <= far))
        far = jnp.where(ok, jnp.maximum(far, tfi), far)
        return (far, ok), ok

    N = rays_o.shape[0]
    (far, _), ok_s = jax.lax.scan(
        step,
        (jnp.full((N,), -jnp.inf), jnp.ones((N,), bool)),
        (tn_s.T, tf_s.T, hit_s.T),
    )
    ok_s = ok_s.T  # [N, T] processed-while-alive, in sorted order
    ok = jnp.zeros_like(ok_s).at[
        jnp.arange(N)[:, None], order
    ].set(ok_s)  # back to tile order
    bg_valid = far > -jnp.inf
    far = jnp.where(bg_valid, far, 0.1)

    # slots: visited tiles whose exit equals far (tile-grid boxes share
    # boundary planes; tolerance covers float differences)
    is_exit = ok & (jnp.abs(tf - far[:, None]) <= 1e-5 * jnp.abs(far[:, None]))
    p = rays_o + far[:, None] * rays_d  # outgoing point [N, 3]
    u = jnp.clip(
        (p[:, None, :] - scene.block_corner[None]) / scene.block_size[None],
        0.0, 1.0,
    )  # [N, T, 3] in DOUBLED bboxes
    w_all = _seam_weight(u, scene.block_size[None])  # [N, T]
    score = jnp.where(is_exit, jnp.maximum(w_all, 1e-12), -1.0)
    vals, tiles = jax.lax.top_k(score, K)
    used = vals > 0.0
    w = jnp.where(used, vals, 0.0)
    # single-slot rays get weight 1 (reference index==1 fast path)
    n_used = jnp.sum(used, -1, keepdims=True)
    w = jnp.where(n_used == 1, used.astype(w.dtype), w)
    w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12)
    return tiles, w, far, bg_valid


def _bg_zvals(far: jax.Array, num_bg_sample: int):
    """Inverse-z samples from the exit to 1e6 (``inverse_z_sampling``,
    rendering_kernel.cu:815-868) — shared by all exit slots."""
    N = far.shape[0]
    tb = jnp.linspace(0.0, 1.0, num_bg_sample)[None]
    z = 1.0 / ((1.0 / (far[:, None] + 1e-6)) * (1.0 - tb) + (1.0 / 1e6) * tb)
    d = jnp.concatenate([z[:, 1:] - z[:, :-1], jnp.full((N, 1), 1e-6)], axis=1)
    return z, d


def _contract_fg(corner, size, pts):
    """Inner bbox of (doubled corner/size) -> [-1, 1]."""
    return ((pts - corner) / size) * 4.0 - 2.0


def _contract_bg(corner, size, pts):
    x = ((pts - corner) / size) * 4.0 - 2.0
    linf = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-9)
    ratio = (2.0 - 1.0 / linf) / linf
    return jnp.where(linf > 1.0, x * ratio, x)


def _composite_premult(alpha: jax.Array, color: jax.Array, z: jax.Array):
    """accumulate_color (:623-702): front-to-back with premultiplied
    per-sample color; returns (rgb, depth, T_left)."""
    N = alpha.shape[0]
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((N, 1)), 1.0 - alpha], axis=1), axis=1
    )[:, :-1]
    rgb = jnp.sum(trans[..., None] * color, axis=1)
    depth = jnp.sum(trans * alpha * z, axis=1)
    T_left = trans[:, -1] * (1.0 - alpha[:, -1])
    return rgb, depth, T_left


# ---------------------------------------------------------------------------
# staged (per-tile unrolled) backend — the parity oracle
# ---------------------------------------------------------------------------

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
            contains = jnp.broadcast_to((exit_tile == t)[:, None], (N, S))
            xc = _contract_bg(corner, size, pts)
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
            xc = _contract_fg(corner, size, pts)

        feats = _tile_encode(scene, t, xc.reshape(-1, 3)).reshape(N, S, -1)
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


def _render_staged(
    scene, rays_o, rays_d, z_vals, dists, valid,
    bg_tiles, bg_w, z_bg, d_bg, bg_valid, invalid_underground,
):
    N = rays_o.shape[0]
    K = bg_tiles.shape[1]
    pts = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
    diffuse, specular, alpha = _eval_blended(scene, pts, rays_d, dists, False)
    alpha = jnp.where(valid[:, None], alpha, 0.0)
    rgb_fg, depth_fg, T_left = _composite_premult(
        alpha, diffuse + specular, z_vals
    )

    pts_bg = rays_o[:, None, :] + z_bg[..., None] * rays_d[:, None, :]
    rgb_bg = jnp.zeros((N, 3))
    depth_bg = jnp.zeros((N,))
    for k in range(K):
        bdiff, bspec, balpha = _eval_blended(
            scene, pts_bg, rays_d, d_bg, True, exit_tile=bg_tiles[:, k]
        )
        bmask = _bg_mask(
            scene, bg_tiles[:, k], rays_o, rays_d, z_bg,
            bg_valid, invalid_underground,
        )
        rgb_k, depth_k, _ = _composite_premult(
            balpha * bmask, (bdiff + bspec) * bmask[..., None], z_bg
        )
        rgb_bg = rgb_bg + bg_w[:, k:k + 1] * rgb_k
        depth_bg = depth_bg + bg_w[:, k] * depth_k
    return rgb_fg, depth_fg, T_left, rgb_bg, depth_bg, valid


def _bg_mask(
    scene, tile_k, rays_o, rays_d, z_bg, bg_valid, invalid_underground
):
    """[N, 1] float mask on bg contributions of one exit slot."""
    ok = bg_valid
    if invalid_underground:
        # suppress bg through the ground plane (hashgrid/__init__.py:287-293)
        inner_cy = scene.block_corner[tile_k, 1] + scene.block_size[tile_k, 1] / 4.0
        outgoing = rays_o + z_bg[:, :1] * rays_d  # first bg sample = exit
        ok = ok & ~(jnp.abs(outgoing[:, 1] - inner_cy) < 1e-4)
    return ok.astype(z_bg.dtype)[:, None]


# ---------------------------------------------------------------------------
# windowed sorted-stream backend (TPU production path)
# ---------------------------------------------------------------------------

def _decode_stream(scene, stream, chunk_tile, feat_flat, res0, fuse):
    """Evaluate the decoder over the sorted stream -> [Np, 4] columns
    (sigma, diffuse + tint*specular). Fused: single Pallas megakernel;
    unfused: hash lookup + chunk-batched XLA decoder (parity oracle)."""
    from scanerf_tpu.ops.pallas import hash_encode as hw

    if fuse:
        from scanerf_tpu.ops.pallas import fused_render as fr

        dec_slabs = fr.pack_decoder_slabs(scene.decoders)
        return fr.hash_decode_fused(
            stream, chunk_tile, feat_flat, res0, dec_slabs
        )

    NC = stream.pts.shape[0]
    L = feat_flat.shape[0]
    F = 2  # kernel-wide constant (interleaved feature lanes)
    feats_s = hw.hash_lookup_sorted(
        stream.pts, stream.meta, stream.visited, feat_flat, res0
    )  # [Np, L*F]
    dec_c = jax.tree_util.tree_map(
        lambda p: p[chunk_tile], scene.decoders
    )
    feats_c = feats_s.reshape(NC, hw.CHUNK, L * F)
    dirs_c = stream.pts[:, 4:7, :].transpose(0, 2, 1)  # [NC, CHUNK, 3]
    out_c = jax.vmap(decoder_lib.apply_decoder, in_axes=(0, 0, 0, None))(
        dec_c, feats_c, dirs_c, jnp.ones((L * F,), jnp.float32)
    )
    # only (sigma, diffuse + tint*specular) leave the sorted stream —
    # the unsort is a lax.sort whose cost scales with the column count,
    # and the blend needs nothing else
    return jnp.concatenate(
        [out_c["sigma"],
         out_c["diffuse"] + out_c["tint"] * out_c["specular"]],
        axis=-1,
    ).reshape(NC * hw.CHUNK, 4)

def _eval_rows(scene, X, TID, DIR, fuse_decoder, dead=None):
    """Sorted-stream evaluation of arbitrary (point, tile) rows:
    sort_pack -> windowed hash (+ fused ShallowMLP) -> unsort. Returns
    [R, 4] columns (sigma, diffuse + tint*specular) in input row order.
    Shared by the one-shot windowed render and the slab-marched
    early-termination path (render/early_term.py).

    ``dead`` [R] bool marks rows whose outputs the caller's blend masks
    discard (parked fg slots, unoccupied samples, unused bg exits) —
    they route to the stream's sentinel window and whole-dead chunks
    skip the hash gathers AND the in-kernel decoder
    (hash_encode.sort_pack docstring; typically >half the fg rows at
    MAX_PTS_BLOCKS=4 away from tile-corner overlaps)."""
    from scanerf_tpu.ops.pallas import hash_encode as hw

    T, L, H, F = scene.features.shape
    stream = hw.sort_pack_tables(X, DIR, TID, H, T, dead=dead)
    if scene.features_flat is not None:
        feat_flat = scene.features_flat  # precomputed at load (no copy)
    else:
        feat_flat = scene.features.transpose(1, 0, 2, 3).reshape(
            L, T * H * F
        )
    res0 = scene.resolutions[0]
    # per-chunk decoder: each CHUNK lies inside one tile's table range
    NW = H // hw.W
    chunk_tile = jnp.clip(stream.meta[:, 0, 0] * hw.WB // NW, 0, T - 1)
    cols = _decode_stream(
        scene, stream, chunk_tile, feat_flat, res0, fuse_decoder
    )  # [Np, 4]
    return hw.unsort_rows(cols, stream.pidp, stream.inv_full, X.shape[0])


def _render_windowed(
    scene, rays_o, rays_d, z_vals, dists, valid,
    bg_tiles, bg_w, z_bg, d_bg, bg_valid, invalid_underground,
    max_blend_tiles=MAX_PTS_BLOCKS, fuse_decoder=True,
):
    """Capped-slot fused evaluation: ONE windowed hash lookup + ONE
    chunk-batched decoder pass over all fg and bg (sample, tile) slots.

    ``fuse_decoder=True`` (default) runs the ShallowMLP INSIDE the
    Pallas kernel (ops/pallas/fused_render.py — the reference
    ``pts_inference`` megakernel's role): hash features never round-trip
    HBM; only (sigma, premultiplied rgb) leave the sorted stream.
    ``False`` keeps the chunk-batched XLA decoder (parity oracle)."""
    T, L, H, F = scene.features.shape
    N, S = z_vals.shape
    Sb = z_bg.shape[1]
    Kf = min(max_blend_tiles, T)
    Kb = bg_tiles.shape[1]
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)  # [N, 1]

    pts = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
    if scene.tile_lut is not None:
        tags, w_fg, m_any, m_eval = _fg_slots_lut(scene, pts, Kf)
    else:
        tags, w_fg, m_any, m_eval = _fg_slots(scene, pts, Kf)  # [N,S,Kf]

    # fg rows: contraction under each slot's tile
    cor_f = scene.block_corner[tags]  # [N,S,Kf,3]
    siz_f = scene.block_size[tags]
    x_fg = _contract_fg(cor_f, siz_f, pts[:, :, None, :])
    x_fg = jnp.where(m_any[..., None], x_fg, 0.0)  # park unused slots

    # bg rows: every exit slot evaluates the SAME world points under its
    # own tile's L-inf contraction
    pts_bg = rays_o[:, None, :] + z_bg[..., None] * rays_d[:, None, :]
    cor_b = scene.block_corner[bg_tiles][:, None]  # [N,1,Kb,3]
    siz_b = scene.block_size[bg_tiles][:, None]
    x_bg = _contract_bg(cor_b, siz_b, pts_bg[:, :, None, :])
    bg_used = (bg_w > 0.0)[:, None, :]  # [N,1,Kb]
    x_bg = jnp.where(
        jnp.broadcast_to(bg_used[..., None], x_bg.shape), x_bg, 0.0
    )

    n_fg = N * S * Kf
    # SLOT-MAJOR stream order ([K,N,S] flattened, not [N,S,K]): within
    # one slot the stream is ray-major and depth-ordered inside a single
    # tile, so window ids are piecewise constant — the same coherence
    # the training stream has, which PERMUTE_MODE="runs" turns into a
    # run-table sort (PERF.md round-3d). Slot-fastest order would
    # alternate tiles sample-to-sample (runs of length ~1 in overlaps).
    # Row values are order-independent and unsort_rows restores this
    # exact order, so the blend below is unaffected in every mode.
    X = jnp.concatenate([
        x_fg.transpose(2, 0, 1, 3).reshape(-1, 3),
        x_bg.transpose(2, 0, 1, 3).reshape(-1, 3),
    ])
    TID = jnp.concatenate([
        tags.transpose(2, 0, 1).reshape(-1),
        jnp.broadcast_to(bg_tiles[:, None, :], (N, Sb, Kb))
           .transpose(2, 0, 1).reshape(-1),
    ])
    DIR = jnp.concatenate([
        jnp.broadcast_to(rays_d[:, None, None, :], (N, S, Kf, 3))
           .transpose(2, 0, 1, 3).reshape(-1, 3),
        jnp.broadcast_to(rays_d[:, None, None, :], (N, Sb, Kb, 3))
           .transpose(2, 0, 1, 3).reshape(-1, 3),
    ])

    # dead rows (zero blend weight downstream): parked/unoccupied fg
    # slots and unused/invalid bg exits — the stream skips their chunks
    DEAD = jnp.concatenate([
        (~(m_eval & valid[:, None, None])).transpose(2, 0, 1).reshape(-1),
        jnp.broadcast_to(
            ~(bg_used & bg_valid[:, None, None]), (N, Sb, Kb)
        ).transpose(2, 0, 1).reshape(-1),
    ])
    # tables stay in the scene dtype: load_scene(dtype=jnp.bfloat16)
    # keeps them half-width through the kernel's slab DMA (widened to
    # f32 in-kernel at relayout) — half the HBM footprint and traffic
    rows = _eval_rows(scene, X, TID, DIR, fuse_decoder, DEAD)

    # ---- fg blend (pts_inference :500-621) ----
    rf = jnp.moveaxis(rows[:n_fg].reshape(Kf, N, S, 4), 0, 2)
    sig_f = rf[..., 0]
    alpha_f = 1.0 - jnp.exp(-sig_f * (dists * dnorm)[..., None])
    wa = w_fg * alpha_f * m_eval.astype(jnp.float32)
    color_f = rf[..., 1:4]  # diffuse + tint*specular
    wsafe = jnp.maximum(jnp.sum(w_fg * m_any, -1), 1e-8)
    alpha = jnp.sum(wa, -1) / wsafe
    color = jnp.sum(wa[..., None] * color_f, -2) / wsafe[..., None]
    alpha = jnp.where(valid[:, None], alpha, 0.0)
    rgb_fg, depth_fg, T_left = _composite_premult(alpha, color, z_vals)

    # ---- bg: composite each exit slot separately, then blend ----
    rb = jnp.moveaxis(rows[n_fg:].reshape(Kb, N, Sb, 4), 0, 2)
    sig_b = rb[..., 0]
    alpha_b = 1.0 - jnp.exp(-sig_b * (d_bg * dnorm)[..., None])  # [N,Sb,Kb]
    color_b = rb[..., 1:4]
    rgb_bg = jnp.zeros((N, 3))
    depth_bg = jnp.zeros((N,))
    for k in range(Kb):
        bmask = _bg_mask(
            scene, bg_tiles[:, k], rays_o, rays_d, z_bg,
            bg_valid, invalid_underground,
        )
        a_k = alpha_b[..., k] * bmask
        rgb_k, depth_k, _ = _composite_premult(
            a_k, a_k[..., None] * color_b[..., k, :], z_bg
        )
        rgb_bg = rgb_bg + bg_w[:, k:k + 1] * rgb_k
        depth_bg = depth_bg + bg_w[:, k] * depth_k
    return rgb_fg, depth_fg, T_left, rgb_bg, depth_bg, valid


# ---------------------------------------------------------------------------
# full render
# ---------------------------------------------------------------------------

def _resolve_backend(scene: MultiTileScene, backend: str) -> str:
    if backend == "auto":
        backend = "windowed" if scene.hash_layout == "windowed" else "xla"
    if backend == "windowed":
        assert scene.hash_layout == "windowed", (
            "windowed renderer needs tiles trained with hash_backend="
            "'windowed' (hash_layout in feature.npz)")
        assert scene.shared_res, (
            "windowed renderer needs a shared resolution ladder "
            "(equal tile sizes)")
    return backend


def _render_rays_impl(
    scene: MultiTileScene,
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_sample: int,
    num_bg_sample: int,
    num_march: int,
    invalid_underground: bool,
    backend: str,
    max_blend_tiles: int = MAX_PTS_BLOCKS,
    fuse_decoder: bool = True,
) -> dict[str, jax.Array]:
    z_vals, dists, valid = _sample_union(
        scene, rays_o, rays_d, num_sample, num_march
    )
    bg_tiles, bg_w, far, bg_valid = _exit_slots(
        scene, rays_o, rays_d,
        min(max_blend_tiles, scene.features.shape[0]),
    )
    z_bg, d_bg = _bg_zvals(far, num_bg_sample)

    if backend == "windowed":
        impl = partial(_render_windowed, max_blend_tiles=max_blend_tiles,
                       fuse_decoder=fuse_decoder)
    else:
        impl = _render_staged
    rgb_fg, depth_fg, T_left, rgb_bg, depth_bg, valid = impl(
        scene, rays_o, rays_d, z_vals, dists, valid,
        bg_tiles, bg_w, z_bg, d_bg, bg_valid, invalid_underground,
    )

    rgb = rgb_fg + T_left[:, None] * rgb_bg
    depth = depth_fg + T_left * depth_bg
    return {
        "rgb": jnp.clip(rgb, 0.0, 1.0),
        "depth": depth[:, None],
        "rgb_fg": rgb_fg,
        "T_left": T_left,
        "fore_valid": valid,
    }


@partial(jax.jit, static_argnames=(
    "num_sample", "num_bg_sample", "num_march", "invalid_underground",
    "backend", "max_blend_tiles", "fuse_decoder",
))
def render_rays(
    scene: MultiTileScene,
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_sample: int = 128,
    num_bg_sample: int = 128,
    num_march: int = 512,
    invalid_underground: bool = False,
    backend: str = "auto",
    max_blend_tiles: int = MAX_PTS_BLOCKS,
    fuse_decoder: bool = True,
) -> dict[str, jax.Array]:
    """backend: "xla" staged per-tile loop | "windowed" capped-slot
    sorted-stream Pallas path (requires windowed-layout tiles with a
    shared resolution ladder) | "auto" picks windowed when eligible.
    max_blend_tiles (<= MAX_PTS_BLOCKS=4) trades seam-corner blending
    accuracy for row count — 2 suffices away from 4-tile corners at the
    standard 0.2 overlap. fuse_decoder: run the ShallowMLP inside the
    Pallas kernel (windowed backend only; ops/pallas/fused_render.py)."""
    backend = _resolve_backend(scene, backend)
    return _render_rays_impl(
        scene, rays_o, rays_d, num_sample, num_bg_sample, num_march,
        invalid_underground, backend, max_blend_tiles, fuse_decoder,
    )


@partial(jax.jit, static_argnames=(
    "num_sample", "num_bg_sample", "num_march", "invalid_underground",
    "backend", "mesh", "max_blend_tiles", "fuse_decoder",
))
def render_rays_sharded(
    scene: MultiTileScene,
    rays_o: jax.Array,
    rays_d: jax.Array,
    mesh: jax.sharding.Mesh,
    num_sample: int = 128,
    num_bg_sample: int = 128,
    num_march: int = 512,
    invalid_underground: bool = False,
    backend: str = "auto",
    max_blend_tiles: int = MAX_PTS_BLOCKS,
    fuse_decoder: bool = True,
) -> dict[str, jax.Array]:
    """Multi-chip render: rays shard over the mesh's ``rays`` axis, the
    scene replicates, every device renders its slice independently (the
    reference's per-GPU frame loop, rendering.py:195-270, turned into
    SPMD). shard_map (not plain jit) so the windowed path's lax.sorts
    stay device-local instead of becoming global collective sorts."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    backend = _resolve_backend(scene, backend)
    n_dev = mesh.devices.size
    assert rays_o.shape[0] % n_dev == 0, (rays_o.shape, n_dev)

    fn = partial(
        _render_rays_impl,
        num_sample=num_sample, num_bg_sample=num_bg_sample,
        num_march=num_march, invalid_underground=invalid_underground,
        backend=backend, max_blend_tiles=max_blend_tiles,
        fuse_decoder=fuse_decoder,
    )
    shmap = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P("rays"), P("rays")),
        out_specs=P("rays"),
        # pallas_call inside shard_map cannot express varying-mesh-axes
        # metadata on its out_shape — disable the vma check
        check_vma=False,
    )
    return shmap(scene, rays_o, rays_d)


def render_image(
    scene: MultiTileScene,
    K: np.ndarray,
    c2w: np.ndarray,
    H: int,
    W: int,
    chunk: int = 2**13,
    sharded: bool = False,
    early_term: bool = False,
    early_kwargs: dict | None = None,
    **kwargs,
) -> dict[str, np.ndarray]:
    """Full-frame render in chunks (rendering.py:195-270 driver).
    ``sharded=True`` spreads each chunk's rays over every local device
    (render_rays_sharded). ``early_term=True`` uses the slab-marched
    early-ray-termination path (render/early_term.py — the reference's
    break-on-transparency, rendering.py:341-345); ``early_kwargs``
    passes its slab/term_eps/bucket_min/stats knobs."""
    from scanerf_tpu.utils import lie, rays as rays_mod

    # the windowed stream carries point ids as f32 (exact below 2^24):
    # clamp the chunk so chunk * (S*Kf + Sb*Kb) stays under the limit
    S = kwargs.get("num_sample", 128)
    Sb = kwargs.get("num_bg_sample", 128)
    Kmax = min(kwargs.get("max_blend_tiles", MAX_PTS_BLOCKS),
               scene.features.shape[0])
    rows_per_ray = (S + Sb) * Kmax
    max_chunk = max((2**24 - 1) // max(rows_per_ray, 1), 256)
    if chunk > max_chunk:
        chunk = max_chunk

    mesh = None
    if sharded:
        from jax.sharding import Mesh

        devs = np.array(jax.devices())
        if devs.size > 1:
            mesh = Mesh(devs, ("rays",))
            chunk = ((chunk + devs.size - 1) // devs.size) * devs.size

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
    if early_term:
        assert not sharded, "early_term is a single-device driver"
        from scanerf_tpu.render.early_term import render_rays_early
    for i in range(0, n + pad, chunk):
        ro, rd = rays_o[i : i + chunk], rays_d[i : i + chunk]
        if early_term:
            ek = dict(early_kwargs or {})
            kw = {k: v for k, v in kwargs.items() if k != "backend"}
            out = render_rays_early(scene, ro, rd, **kw, **ek)
        elif mesh is not None:
            out = render_rays_sharded(scene, ro, rd, mesh, **kwargs)
        else:
            out = render_rays(scene, ro, rd, **kwargs)
        # keep results ON DEVICE: jax dispatch is async, so appending
        # the device arrays lets chunk i+1 launch while i computes; a
        # per-chunk np.asarray would serialize a host round-trip into
        # every chunk (chunks/frame x tunnel latency of dead time). A
        # 1080p frame's outputs are ~33 MB — HBM-trivial.
        outs["rgb"].append(out["rgb"])
        outs["depth"].append(out["depth"])
    return {
        k: np.asarray(jnp.concatenate(v))[:n].reshape(H, W, -1)
        for k, v in outs.items()
    }
