"""Early ray termination with alive-ray compaction for the windowed
renderer.

The reference stops marching a ray once its transparency saturates:
``runing_mask = (tracing_idx < max_tracing_block) & (transparency >
1e-5)`` (rendering.py:341-345), and the CUDA megakernel breaks its
per-thread sample loop on the same condition (rendering_kernel.cu:507).
On an opaque scene most rays terminate after a handful of samples, so
the fixed 128-sample budget of the one-shot windowed path pays full
sampling + hash + MLP cost for work whose compositing weight is < 1e-5.

A per-thread ``break`` does not exist under XLA's static shapes. The
TPU-native equivalent is DEPTH-SLAB MARCHING with host-driven bucketed
compaction:

1. the occupancy-CDF sample positions are computed once for the full
   ray set (cheap — ~13% of the one-shot chunk budget),
2. the fg samples are evaluated ``slab`` samples at a time; after each
   slab the per-ray carried transparency decides who is still alive,
3. the alive rays are COMPACTED (``jnp.nonzero`` + row gather) into a
   dense batch whose size is the alive count rounded up to a power of
   two (so recompiles are bounded at log2(N) shapes, each cached), and
   only that batch pays the next slab's sort_pack + hash-kernel +
   decoder cost — the sorted-stream machinery is already a compaction
   engine, this just feeds it fewer rows,
4. the background pass (half the one-shot row count) runs ONLY for
   rays that still have transparency left AND a tile exit — on opaque
   scenes that is a small fraction of the chunk.

Between slabs the host fetches ONE scalar (the alive count) — the
per-slab sync this costs is what buys the structural work reduction;
everything else stays on device. Results match the one-shot renderer
within the T < ``term_eps`` truncation the reference itself applies
(with ``term_eps=0`` the paths are equal up to float associativity —
tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from scanerf_tpu.render import renderer as R
from scanerf_tpu.render.renderer import MAX_PTS_BLOCKS


def _bucket(cnt: int, n: int, bmin: int) -> int:
    """Alive count -> static batch size: next power of two, clamped to
    [bmin, n]. Power-of-two buckets bound both the wasted rows (< 2x)
    and the number of compiled shape variants (log2(n))."""
    m = 1 << max(int(cnt) - 1, 0).bit_length()
    return max(min(max(m, bmin), n), 1)


@partial(jax.jit, static_argnames=("num_sample", "num_march",
                                   "max_blend_tiles"))
def _prelude(scene, rays_o, rays_d, *, num_sample, num_march,
             max_blend_tiles):
    """Full-batch sampling + exit-slot geometry (once per chunk)."""
    z_vals, dists, valid = R._sample_union(
        scene, rays_o, rays_d, num_sample, num_march
    )
    bg_tiles, bg_w, far, bg_valid = R._exit_slots(
        scene, rays_o, rays_d,
        min(max_blend_tiles, scene.features.shape[0]),
    )
    return z_vals, dists, valid, bg_tiles, bg_w, far, bg_valid


@partial(jax.jit, static_argnames=("slab",))
def _gather_fg(idx, ro_p, rd_p, z_p, d_p, valid_p, T_p, j0, *, slab):
    z = jax.lax.dynamic_slice_in_dim(z_p, j0, slab, axis=1)
    d = jax.lax.dynamic_slice_in_dim(d_p, j0, slab, axis=1)
    return ro_p[idx], rd_p[idx], z[idx], d[idx], valid_p[idx], T_p[idx]


@partial(jax.jit, static_argnames=("max_blend_tiles", "fuse_decoder"))
def _fg_slab_eval(scene, ro, rd, z_slab, dists_slab, valid, T_in, *,
                  max_blend_tiles, fuse_decoder):
    """One depth slab of the fg blend (the fg half of
    renderer._render_windowed), composited against the carried
    transparency ``T_in``. Returns (rgb_add, depth_add, T_out)."""
    T = scene.features.shape[0]
    M, S1 = z_slab.shape
    Kf = min(max_blend_tiles, T)
    dnorm = jnp.linalg.norm(rd, axis=-1, keepdims=True)

    pts = ro[:, None, :] + z_slab[..., None] * rd[:, None, :]
    if scene.tile_lut is not None:
        tags, w_fg, m_any, m_eval = R._fg_slots_lut(scene, pts, Kf)
    else:
        tags, w_fg, m_any, m_eval = R._fg_slots(scene, pts, Kf)
    cor = scene.block_corner[tags]
    siz = scene.block_size[tags]
    x = R._contract_fg(cor, siz, pts[:, :, None, :])
    x = jnp.where(m_any[..., None], x, 0.0)
    # slot-major stream order — same window coherence as the one-shot
    # path (renderer._render_windowed's layout comment)
    X = x.transpose(2, 0, 1, 3).reshape(-1, 3)
    TID = tags.transpose(2, 0, 1).reshape(-1)
    DIR = jnp.broadcast_to(
        rd[:, None, None, :], (M, S1, Kf, 3)
    ).transpose(2, 0, 1, 3).reshape(-1, 3)
    DEAD = (~(m_eval & valid[:, None, None])).transpose(2, 0, 1).reshape(-1)
    rows = R._eval_rows(scene, X, TID, DIR, fuse_decoder, DEAD)

    rf = jnp.moveaxis(rows.reshape(Kf, M, S1, 4), 0, 2)
    alpha_f = 1.0 - jnp.exp(-rf[..., 0] * (dists_slab * dnorm)[..., None])
    wa = w_fg * alpha_f * m_eval.astype(jnp.float32)
    color_f = rf[..., 1:4]
    wsafe = jnp.maximum(jnp.sum(w_fg * m_any, -1), 1e-8)
    alpha = jnp.sum(wa, -1) / wsafe
    color = jnp.sum(wa[..., None] * color_f, -2) / wsafe[..., None]
    alpha = jnp.where(valid[:, None], alpha, 0.0)

    trans = T_in[:, None] * jnp.cumprod(
        jnp.concatenate([jnp.ones((M, 1)), 1.0 - alpha], axis=1), axis=1
    )[:, :-1]
    rgb_add = jnp.sum(trans[..., None] * color, axis=1)
    depth_add = jnp.sum(trans * alpha * z_slab, axis=1)
    T_out = trans[:, -1] * (1.0 - alpha[:, -1])
    return rgb_add, depth_add, T_out


@jax.jit
def _scatter_fg(rgb_p, depth_p, T_p, idx, rgb_add, depth_add, T_out,
                valid, eps):
    """Scatter a slab's contributions back into the padded full-chunk
    state (dummy slot N absorbs the compaction fill rows) and produce
    the next alive mask + its count (the ONE scalar the host fetches)."""
    rgb_p = rgb_p.at[idx].add(rgb_add)
    depth_p = depth_p.at[idx].add(depth_add)
    T_p = T_p.at[idx].set(T_out)
    alive = valid & (T_p[:-1] > eps)
    return rgb_p, depth_p, T_p, alive, jnp.sum(alive)


@partial(jax.jit, static_argnames=("num_bg_sample", "invalid_underground",
                                   "fuse_decoder"))
def _bg_eval(scene, ro, rd, bg_tiles, bg_w, far, bg_valid, *,
             num_bg_sample, invalid_underground, fuse_decoder):
    """Background pass for the compacted non-opaque rays (the bg half of
    renderer._render_windowed). Returns (rgb_bg, depth_bg) — the caller
    weights by the carried fg transparency."""
    M = ro.shape[0]
    Kb = bg_tiles.shape[1]
    Sb = num_bg_sample
    dnorm = jnp.linalg.norm(rd, axis=-1, keepdims=True)
    z_bg, d_bg = R._bg_zvals(far, num_bg_sample)

    pts_bg = ro[:, None, :] + z_bg[..., None] * rd[:, None, :]
    cor_b = scene.block_corner[bg_tiles][:, None]
    siz_b = scene.block_size[bg_tiles][:, None]
    x_bg = R._contract_bg(cor_b, siz_b, pts_bg[:, :, None, :])
    bg_used = (bg_w > 0.0)[:, None, :]
    x_bg = jnp.where(
        jnp.broadcast_to(bg_used[..., None], x_bg.shape), x_bg, 0.0
    )
    X = x_bg.transpose(2, 0, 1, 3).reshape(-1, 3)
    TID = jnp.broadcast_to(
        bg_tiles[:, None, :], (M, Sb, Kb)
    ).transpose(2, 0, 1).reshape(-1)
    DIR = jnp.broadcast_to(
        rd[:, None, None, :], (M, Sb, Kb, 3)
    ).transpose(2, 0, 1, 3).reshape(-1, 3)
    DEAD = jnp.broadcast_to(
        ~(bg_used & bg_valid[:, None, None]), (M, Sb, Kb)
    ).transpose(2, 0, 1).reshape(-1)
    rows = R._eval_rows(scene, X, TID, DIR, fuse_decoder, DEAD)

    rb = jnp.moveaxis(rows.reshape(Kb, M, Sb, 4), 0, 2)
    alpha_b = 1.0 - jnp.exp(-rb[..., 0] * (d_bg * dnorm)[..., None])
    color_b = rb[..., 1:4]
    rgb_bg = jnp.zeros((M, 3))
    depth_bg = jnp.zeros((M,))
    for k in range(Kb):
        bmask = R._bg_mask(
            scene, bg_tiles[:, k], ro, rd, z_bg, bg_valid,
            invalid_underground,
        )
        a_k = alpha_b[..., k] * bmask
        rgb_k, depth_k, _ = R._composite_premult(
            a_k, a_k[..., None] * color_b[..., k, :], z_bg
        )
        rgb_bg = rgb_bg + bg_w[:, k:k + 1] * rgb_k
        depth_bg = depth_bg + bg_w[:, k] * depth_k
    return rgb_bg, depth_bg


def render_rays_early(
    scene,
    rays_o: jax.Array,
    rays_d: jax.Array,
    num_sample: int = 128,
    num_bg_sample: int = 128,
    num_march: int = 512,
    invalid_underground: bool = False,
    max_blend_tiles: int = MAX_PTS_BLOCKS,
    fuse_decoder: bool = True,
    slab: int = 32,
    term_eps: float = 1e-5,
    bucket_min: int = 512,
    stats: dict | None = None,
) -> dict[str, jax.Array]:
    """Early-termination render of one ray chunk (windowed backend).

    Same outputs as ``renderer.render_rays``; differences are bounded by
    the reference's own T < ``term_eps`` truncation. ``slab`` is the fg
    sample count evaluated between compactions (must divide
    ``num_sample``); ``term_eps=0`` disables termination (then the only
    skips are invalid fg rays and exitless bg rays, both exact).
    ``stats``, if given, records evaluated row counts vs the one-shot
    path's fixed budget."""
    assert scene.hash_layout == "windowed", (
        "early-termination render requires windowed-layout tiles")
    assert num_sample % slab == 0, (num_sample, slab)
    N = rays_o.shape[0]
    T = scene.features.shape[0]
    Kf = min(max_blend_tiles, T)
    Kb = min(max_blend_tiles, T)

    z_vals, dists, valid, bg_tiles, bg_w, far, bg_valid = _prelude(
        scene, rays_o, rays_d, num_sample=num_sample,
        num_march=num_march, max_blend_tiles=max_blend_tiles,
    )

    # one dummy slot at index N absorbs the compaction fill rows
    def pad1(a, fill=0.0):
        pad = jnp.full((1,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, pad])

    ro_p = pad1(rays_o)
    rd_p = pad1(rays_d).at[N].set(jnp.array([0.0, 0.0, 1.0]))
    z_p = pad1(z_vals)
    d_p = pad1(dists)
    valid_p = pad1(valid)
    T_p = jnp.ones((N + 1,), jnp.float32)
    rgb_p = jnp.zeros((N + 1, 3), jnp.float32)
    depth_p = jnp.zeros((N + 1,), jnp.float32)

    alive = valid
    cnt = int(jnp.sum(alive))
    eps = jnp.float32(term_eps)
    st = {"n_rays": N, "fg_rows": 0, "bg_rows": 0, "slabs": [],
          "full_fg_rows": N * num_sample * Kf,
          "full_bg_rows": N * num_bg_sample * Kb}

    for j in range(num_sample // slab):
        if cnt == 0:
            break
        M = _bucket(cnt, N, bucket_min)
        idx = jnp.nonzero(alive, size=M, fill_value=N)[0]
        ro, rd, z, dd, vv, Ti = _gather_fg(
            idx, ro_p, rd_p, z_p, d_p, valid_p, T_p,
            jnp.int32(j * slab), slab=slab,
        )
        rgb_add, depth_add, T_out = _fg_slab_eval(
            scene, ro, rd, z, dd, vv, Ti,
            max_blend_tiles=max_blend_tiles, fuse_decoder=fuse_decoder,
        )
        rgb_p, depth_p, T_p, alive, cnt_dev = _scatter_fg(
            rgb_p, depth_p, T_p, idx, rgb_add, depth_add, T_out,
            valid, eps,
        )
        st["slabs"].append((cnt, M))
        st["fg_rows"] += M * slab * Kf
        cnt = int(cnt_dev)  # the per-slab scalar sync

    rgb_fg = rgb_p  # snapshot before bg accumulates in

    # bg only for rays with transparency left AND a tile exit
    alive_bg = (T_p[:-1] > eps) & bg_valid
    cnt_bg = int(jnp.sum(alive_bg))
    if cnt_bg > 0:
        Mb = _bucket(cnt_bg, N, bucket_min)
        idxb = jnp.nonzero(alive_bg, size=Mb, fill_value=N)[0]
        bt_p = pad1(bg_tiles)
        bw_p = pad1(bg_w)
        far_p = pad1(far, 0.1)
        bv_p = pad1(bg_valid)
        rgb_b, depth_b = _bg_eval(
            scene, ro_p[idxb], rd_p[idxb], bt_p[idxb], bw_p[idxb],
            far_p[idxb], bv_p[idxb],
            num_bg_sample=num_bg_sample,
            invalid_underground=invalid_underground,
            fuse_decoder=fuse_decoder,
        )
        Tb = T_p[idxb]
        rgb_p = rgb_p.at[idxb].add(Tb[:, None] * rgb_b)
        depth_p = depth_p.at[idxb].add(Tb * depth_b)
        st["bg_rows"] = Mb * num_bg_sample * Kb
    if stats is not None:  # accumulate across chunks (render_image)
        for k, v in st.items():
            if k == "slabs":
                stats.setdefault("slabs", []).extend(v)
            else:
                stats[k] = stats.get(k, 0) + v

    return {
        "rgb": jnp.clip(rgb_p[:N], 0.0, 1.0),
        "depth": depth_p[:N, None],
        "rgb_fg": rgb_fg[:N],
        "T_left": T_p[:N],
        "fore_valid": valid,
    }
