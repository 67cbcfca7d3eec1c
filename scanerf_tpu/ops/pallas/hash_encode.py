"""Windowed multiresolution hash encoding — sorted-stream Pallas TPU kernel.

Replaces the role of the reference's CUDA embedding kernels
(``hashgrid/src/hashgrid_bg_kernel.cu:14-226``: fused 8-corner hash +
trilinear forward, atomicAdd backward) with a TPU-native design. TPU has
no fast random gather/scatter, so the table layout itself is changed to
make the access pattern streamable:

**Hierarchical window hash.** Each level's table of H entries is split
into ``NW = H / 512`` windows of W=512 entries. A point's window id is a
*spatial* raster cell id (coarse grid over the normalized [0,1]^3 tile
domain, with a piecewise-linear warp that allocates ~42% of windows to
the foreground inner bbox); the in-window slot is the classic prime-XOR
hash of the integer corner coordinates, bit-folded and masked to W. The
expected collision ratio matches the reference's global hash (cells per
entry is identical); the difference is that all 8 corner lookups of a
point land in ONE 512-entry window — one vreg tile of 8x128 f32 lanes —
so a single sort of the points by window id turns every (point, level,
corner) table access into a two-stage in-register ``tpu.dynamic_gather``.
All 16 levels share the same window partition: one sort per call serves
every level.

Deviation from the reference (PARITY.md): a lattice corner shared by
points in different windows resolves to different table entries (feature
duplication across window boundaries, bounded 8x). This adds capacity
rather than collisions; quality is validated by PSNR A/B against the
global-hash XLA path on synthetic scenes.

Pipeline per call (N points, L levels, F=2 features):
 1. window ids; sort by wid carrying (u, viewdir, point id),
 2. pad-align: a second sort lays the stream out so every 1024-point
    chunk falls inside ONE 32-window block (static +NB*1024 rows),
 3. Pallas kernel, grid over chunks: the block's table slab
    (L x 32 windows) is DMA'd to VMEM on block change; per (chunk,
    level) the 8 corner slots/weights are computed on the VPU; each
    spanned window is resolved with two chained one-vreg
    ``take_along_axis`` gathers (lane then sublane),
 4. backward: same structure; the table scatter is an exact one-hot
    ``dot_general`` into a VMEM accumulator slab flushed on block change
    (sequential grid -> no atomics, unlike the CUDA atomicAdd backward),
    plus the analytic dL/dpoints.

Downstream consumers should stay in the sorted stream (run the decoder
on the padded-sorted features, restore ray order once on its small
outputs via ``unsort_rows``) — bulk reordering is the expensive
operation on TPU, not the lookup itself.
"""

from __future__ import annotations

import functools
import os

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scanerf_tpu.ops import hash_encode as he

PRIMES = (1, 2654435761, 805459861)

# How permutations are applied to the stream. "sort": every reorder is a
# lax.sort (4 per train step; safe everywhere — sorts were measured
# faster than XLA row scatter on the round-2 fabric). "gather": sort_pack
# computes the inverse permutation once (elementwise padded positions +
# ONE cheap 2-operand sort) and the other three reorders (unsort fwd,
# unsort bwd, sort_pack bwd) become plain row gathers — 2 sorts + 3
# gathers per step instead of 4 payload-carrying sorts. "runs" goes
# further and removes the N-sized sorts entirely: window ids along a
# ray are piecewise constant (PERF.md round-3c: R/N ~ 0.11 at
# production sample counts), so sort_pack sorts only the run table
# (ONE small R-sort) and derives both the forward expansion and the
# inverse permutation analytically from run offsets — runs are
# contiguous in the ORIGINAL stream, so src[p] and inv[i] are
# elementwise in the run tables. Overflowing the static run capacity
# (SCANERF_RUN_CAP_FRAC, default 0.25) falls back to the sorted path
# inside a lax.cond, so "runs" is always correct. Outputs are bitwise
# identical across modes (same stable permutation, different
# machinery); which is faster is a per-fabric question
# (scripts/bench_permute_ab.py). Static per trace: set before jit.
_PERMUTE_MODE = os.environ.get("SCANERF_PERMUTE_MODE", "sort")

_RUN_CAP_FRAC = float(os.environ.get("SCANERF_RUN_CAP_FRAC", "0.25"))

PERMUTE_MODES = ("sort", "gather", "gather_narrow", "runs")


def set_permute_mode(mode: str) -> None:
    """Select permutation machinery: "sort" (default), "gather",
    "gather_narrow" (gather + 2-operand main sort), or "runs"
    (run-length sort: no N-sized sorts at all)."""
    global _PERMUTE_MODE
    if mode not in PERMUTE_MODES:
        raise ValueError(mode)
    _PERMUTE_MODE = mode


def permute_mode() -> str:
    return _PERMUTE_MODE


def set_run_cap_frac(frac: float) -> None:
    """Static run-table capacity for "runs" mode, as a fraction of N.

    Measured run statistics are R/N ~ 0.11-0.15 (PERF.md); the default
    0.25 gives ~2x headroom. A stream with more runs than the capacity
    falls back to the sorted path (correct, slower). 1.0 disables the
    fallback entirely (used by the parity tests on incoherent data).
    """
    global _RUN_CAP_FRAC
    if not 0.0 < frac <= 1.0:
        raise ValueError(frac)
    _RUN_CAP_FRAC = frac


def _run_capacity(N: int) -> int:
    return max(min(N, 256), int(N * _RUN_CAP_FRAC))


def _gather_mode() -> bool:
    """The gather variants and "runs" share the inverse-permutation
    machinery (unsort fwd/bwd and sort_pack bwd are row gathers);
    "gather_narrow" additionally narrows the main sort to 2 operands
    and gathers the payload columns."""
    return _PERMUTE_MODE in ("gather", "gather_narrow", "runs")

W = 512  # entries per window (one 8x128 f32 vreg of interleaved feats)
WB = 32  # windows per block (slab unit)
# Points per grid step. Larger chunks amortize the per-grid-step Pallas
# pipeline overhead over more points at the cost of more block-aligned
# padding (pad rows <= NB*CHUNK, ~3% of a 4.2M stream at 1024) and a
# proportionally larger per-chunk pts/out VMEM footprint (the 4 MB table
# slab dominates either way). Read once at import; a per-fabric A/B
# knob (scripts/bench_chunk_ab.py), NOT switchable mid-process — every
# module-level consumer (fused_train/fused_render/renderer) binds it at
# import time.
CHUNK = int(os.environ.get("SCANERF_CHUNK", "1024"))
# CHUNK >= 256 (SUBT >= 2): fused_render stashes the per-chunk tile id
# at meta[:, 1, 3]; with SUBT=1 that scatter would silently drop and
# the kernel's meta_ref[0, 1, 3] read would be out of bounds.
assert CHUNK % 128 == 0 and CHUNK >= 256, CHUNK
SUBT = CHUNK // 128  # lane subtiles per chunk
WIN_SUB = W * 2 // 128  # sublane rows per window (8)
BLOCK_SUB = WB * WIN_SUB  # sublane rows per block slab (256)
BLOCK_ENTRIES = W * WB


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# geometry / indexing helpers (shared by kernel and jnp reference)
# ---------------------------------------------------------------------------

@functools.cache
def geometry(H: int):
    """Window grid for a table of H entries: (NW, NB, (Cx, Cy, Cz))."""
    assert H >= W * WB and (H & (H - 1)) == 0, H
    NW = H // W
    bits = int(np.log2(NW))
    bx = (bits + 2) // 3
    by = (bits + 1) // 3
    bz = bits // 3
    return NW, NW // WB, (2**bx, 2**by, 2**bz)


def expand_warp(u: jax.Array) -> jax.Array:
    """Piecewise-linear warp allocating more windows to the foreground.

    The fg contraction maps the inner bbox to the center octant
    u in [0.25, 0.75] (1/8 of the volume); the warp stretches it to
    [0.125, 0.875] per axis so fg scene detail gets ~42% of the
    hash-table windows instead of 12.5%.
    """
    lo = u * 0.5
    mid = 0.125 + (u - 0.25) * 1.5
    hi = 0.875 + (u - 0.75) * 0.5
    return jnp.where(u < 0.25, lo, jnp.where(u < 0.75, mid, hi))


def window_id(u: jax.Array, H: int) -> jax.Array:
    """Raster window id of points u [N, 3] in [0, 1]^3 -> int32 [N]."""
    _, _, (cx, cy, cz) = geometry(H)
    uw = expand_warp(u)
    c = jnp.floor(uw * jnp.asarray([cx, cy, cz], u.dtype)).astype(jnp.int32)
    c = jnp.clip(c, 0, jnp.asarray([cx - 1, cy - 1, cz - 1]))
    return (c[..., 0] * cy + c[..., 1]) * cz + c[..., 2]


def slot_hash(ix, iy, iz):
    """In-window slot of integer corner coords (uint32 arrays) -> [0, 512).

    Prime-XOR hash (``hashgrid_bg_kernel.cu:14-24``) folded over its high
    bits so the slot does not alias with period W per axis.
    """
    h = (
        ix * jnp.uint32(PRIMES[0])
        ^ iy * jnp.uint32(PRIMES[1])
        ^ iz * jnp.uint32(PRIMES[2])
    )
    h = h ^ (h >> jnp.uint32(9)) ^ (h >> jnp.uint32(18))
    return h & jnp.uint32(W - 1)


# ---------------------------------------------------------------------------
# pure-jnp reference (CPU path + parity oracle)
# ---------------------------------------------------------------------------

def hash_encode_windowed_ref(
    points: jax.Array, features: jax.Array, resolutions: jax.Array
) -> jax.Array:
    """XLA gather/scatter implementation of the SAME windowed hash.

    points [N, 3] in [-2, 2]; features [L, H, F] or flat [L, H*F];
    resolutions [L, 3]. Bit-exact oracle for the Pallas kernel (same
    index math); also the CPU-backend path.
    """
    features = he.as_3d(features)
    L, H, F = features.shape
    N = points.shape[0]
    u = (points + 2.0) * 0.25
    wid = window_id(u, H)  # [N]

    corners = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"),
                       -1).reshape(8, 3)  # x-major: 000 001 ... 111
    corners = jnp.asarray(corners, jnp.uint32)

    def one_level(table, resolution):
        v = u * (resolution.astype(u.dtype) - 1.0)
        bl = jnp.floor(v)
        off = v - bl
        blu = bl.astype(jnp.uint32)
        ic = blu[:, None, :] + corners[None, :, :]  # [N, 8, 3]
        slot = slot_hash(ic[..., 0], ic[..., 1], ic[..., 2])  # [N, 8]
        idx = wid[:, None] * W + slot.astype(jnp.int32)  # [N, 8]
        cf = corners.astype(u.dtype)  # [8, 3]
        wgt = jnp.prod(
            cf[None] * off[:, None, :] + (1 - cf[None]) * (1 - off[:, None, :]),
            axis=-1,
        )  # [N, 8]
        # widen bf16 inference tables before the weighted sum (matches
        # the kernel, which widens at slab load)
        gathered = table[idx].astype(jnp.float32)  # [N, 8, F]
        return jnp.sum(wgt[..., None] * gathered, axis=1)  # [N, F]

    encode_level = jax.checkpoint(one_level)

    def body(carry, xs):
        table, resolution = xs
        return carry, encode_level(table, resolution)

    _, out = jax.lax.scan(body, None, (features, resolutions))
    return jnp.transpose(out, (1, 0, 2)).reshape(N, L * F)


# ---------------------------------------------------------------------------
# sorted-stream construction (sort_pack) with custom VJP
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class SortedStream:
    """Padded, window-sorted point stream (arrays only; see sort_pack)."""

    pts: jax.Array  # [NC, 8, CHUNK] f32: rows u0 u1 u2 widf d0 d1 d2 0
    meta: jax.Array  # [NC, SUBT, 4] i32: (boc, wmin, span, 0) per chunk
    pidp: jax.Array  # [Np] i32 original point index (N for pad rows)
    inv_full: jax.Array  # None ("sort" mode) | [N] i32 padded position
    # of each original row ("gather" mode, computed by sort_pack)
    visited: jax.Array  # [NB] bool block has real points


def padded_size(N: int, H: int, n_tables: int = 1) -> tuple[int, int]:
    """Static (Np, NC) after worst-case block alignment."""
    _, NB, _ = geometry(H)
    NB *= n_tables
    Np = ((N + CHUNK - 1) // CHUNK) * CHUNK + NB * CHUNK
    return Np, Np // CHUNK


def _pack_kernel(meta_ref, src_hbm, pts_ref, pidp_ref, buf, sem0):
    """Ragged-shift pack: output chunk c copies its block's contiguous
    source run [src_start, src_start + n_real) and fills the tail with
    pad rows (u=0.5, wid=padwid, dirs=0, pid=N). One dynamic-offset DMA
    per chunk replaces the former global sort-by-destination.

    HBM DMA lane offsets must be 128-aligned (Mosaic tiling), so the
    copy reads from the aligned-down offset with 128 extra lanes and
    realigns in-register: per 128-lane vreg tile, two one-vreg dynamic
    lane gathers (same trick as ``_win_gather2``) + a select. The source
    carries pid as f32 in row 7 (exact below 2^24 — asserted by the
    caller), so one DMA serves all nine fields."""
    src_start = meta_ref[0, 0, 0]
    n_real = meta_ref[0, 0, 1]
    padwid = meta_ref[0, 0, 2]
    n_total = meta_ref[0, 0, 3]  # N of the source (pad pid value)

    aligned = (src_start // 128) * 128
    sh = src_start - aligned  # [0, 128)

    dma = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(aligned, CHUNK + 128)], buf, sem0)
    dma.start()
    dma.wait()

    iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    lane = (iota + sh) & 127
    carry = iota + sh >= 128  # lane falls into the NEXT vreg tile

    for k in range(SUBT):
        a = buf[:, k * 128:(k + 1) * 128]
        b = buf[:, (k + 1) * 128:(k + 2) * 128]
        ra = jnp.take_along_axis(a, lane, axis=1)
        rb = jnp.take_along_axis(b, lane, axis=1)
        v = jnp.where(carry, rb, ra)  # realigned [8, 128]
        pad = (k * 128 + iota[0:1]) >= n_real  # [1, 128]
        padf = jnp.concatenate([
            jnp.full((3, 128), 0.5, jnp.float32),
            jnp.full((1, 128), 1.0, jnp.float32) * padwid.astype(jnp.float32),
            jnp.zeros((3, 128), jnp.float32),
            jnp.full((1, 128), 1.0, jnp.float32) * n_total.astype(jnp.float32),
        ])
        v = jnp.where(jnp.broadcast_to(pad, (8, 128)), padf, v)
        sl = pl.ds(k * 128, 128)
        pts_ref[0, 0:7, sl] = v[0:7]
        pts_ref[0, 7:8, sl] = jnp.zeros((1, 128), jnp.float32)
        pidp_ref[0, 0:1, sl] = v[7:8].astype(jnp.int32)


def _sort_pack_impl(
    x: jax.Array,
    dirs: jax.Array,
    H: int,
    tids: jax.Array | None = None,
    n_tables: int = 1,
    need_inverse: bool = True,
    dead: jax.Array | None = None,
):
    """Dispatch on the permute mode: "runs" builds the stream from the
    run table (no N-sized sort); everything else goes through the
    sorted path."""
    if _PERMUTE_MODE == "runs":
        return _sort_pack_runs(x, dirs, H, tids, n_tables, dead)
    return _sort_pack_sorted(x, dirs, H, tids, n_tables, need_inverse,
                             dead)


def _point_wids(x: jax.Array, H: int, tids, n_tables: int):
    """Shared head: contracted coords u [N,3] and (multi-table) window
    ids [N] int32."""
    NW, NB, _ = geometry(H)
    NW, NB = NW * n_tables, NB * n_tables
    u = (x + 2.0) * 0.25
    wid = window_id(u, H)
    if tids is not None:
        wid = wid + tids.astype(jnp.int32) * (NW // n_tables)
    return u, wid, NW, NB


def _stream_meta(pts: jax.Array, NC: int, NW: int) -> jax.Array:
    """Per-SUBTILE window ranges: row t of meta[c] = (boc, wmin_t,
    span_t, 0) for the 128-point lane subtile t (the kernel loops each
    subtile over only the windows it actually touches).

    Rows carrying the DEAD/PAD sentinel window id (widf == NW, one past
    the last real window — sort_pack's ``dead`` argument and all pad
    rows) are excluded from the ranges: a subtile of only sentinel rows
    gets span 0, and a chunk whose subtiles are ALL span 0 is skipped
    outright by the kernels (zero outputs, no gathers, no decoder) —
    the sorted-stream analog of the reference's boolean compression of
    masked rays (tile.py:940) and its break-on-transparency renderer
    loop (rendering_kernel.cu:507)."""
    widp = pts[:, 3, :].astype(jnp.int32).reshape(NC, SUBT, 128)
    real = widp < NW
    big = jnp.int32(2**30)
    wmin_t = jnp.min(jnp.where(real, widp, big), axis=2)  # [NC, 8]
    wmax_t = jnp.max(jnp.where(real, widp, -1), axis=2)
    span_t = jnp.maximum(wmax_t - wmin_t + 1, 0)  # 0 for all-sentinel
    wmin_t = jnp.minimum(wmin_t, NW - 1)  # keep wl in-slab when span 0
    boc_c = jnp.clip(jnp.min(wmin_t, axis=1) // WB, 0, NW // WB - 1)
    return jnp.stack(
        [jnp.broadcast_to(boc_c[:, None], (NC, SUBT)),
         wmin_t, span_t,
         jnp.zeros_like(wmin_t)], axis=-1
    ).astype(jnp.int32)


def _sort_pack_runs(
    x: jax.Array,
    dirs: jax.Array,
    H: int,
    tids: jax.Array | None = None,
    n_tables: int = 1,
    dead: jax.Array | None = None,
):
    """Run-length sort_pack: zero N-sized sorts.

    Points arrive ray-major and depth-ordered, so the window id is
    piecewise constant along the stream (~19 fg / ~9 bg runs per
    128-sample ray, PERF.md round-3c). The permutation that stable-sorts
    points by window id therefore decomposes into (a) a stable sort of
    the ~0.11*N run table by window id and (b) contiguous-block
    copies — and because each run is contiguous in the ORIGINAL stream,
    both directions of the permutation are ELEMENTWISE in the run
    tables:

        src[p]  = run_src[seg(p)] + (p - run_dst[seg(p)])   (expansion)
        inv[i]  = run_dst[rid[i]] + (i - run_start[rid[i]]) (inverse)

    seg(p) comes from one R-row scatter of run starts + a cumsum; the
    stream payload is then ONE [Np, 6] row gather straight into the
    padded chunk layout (no pack DMA kernel, no f32 pid round-trip).
    Total machinery: 1 cumsum(N), 1 small searchsorted compaction, 2
    stable R-sorts, 1 R-scatter, 1 cumsum(Np), and row gathers.

    The run capacity is static (``set_run_cap_frac``); a stream with
    more runs falls back to ``_sort_pack_sorted`` inside a lax.cond, so
    the mode is always correct. Output is bitwise identical to the
    sorted path (stable order, same pad values).
    """
    N = x.shape[0]
    assert N >= 1
    u, wid, NW, NB = _point_wids(x, H, tids, n_tables)
    if dead is not None:
        # sentinel window NW: dead rows sort after every real window but
        # stay inside the LAST block's copy run (kk below includes them)
        # so pids remain a full permutation and unsort stays a sort
        wid = jnp.where(dead, NW, wid)
    Np, NC = padded_size(N, H, n_tables)
    R_cap = _run_capacity(N)

    st = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (wid[1:] != wid[:-1]).astype(jnp.int32)]
    )
    cs = jnp.cumsum(st)  # [N] 1-based run count up to i
    iota_n = jnp.arange(N, dtype=jnp.int32)

    def runs_branch(_):
        # --- run table in original order (compaction via binary search)
        qk = jnp.arange(1, R_cap + 1, dtype=jnp.int32)
        run_start = jnp.searchsorted(cs, qk, side="left").astype(jnp.int32)
        run_end = jnp.concatenate(
            [run_start[1:], jnp.full((1,), N, jnp.int32)])
        run_len = run_end - run_start  # 0 for slots past the last run
        sentinel = jnp.int32(2**30)
        run_wid = jnp.where(
            run_start < N, wid[jnp.minimum(run_start, N - 1)], sentinel)

        # --- ONE stable 2-operand sort of the run table by window id;
        # ties keep original run order => point order == stable sort
        ks = jnp.arange(R_cap, dtype=jnp.int32)
        wid_s, k_s = jax.lax.sort((run_wid, ks), num_keys=1)
        len_s = jnp.take(run_len, k_s)
        src_s = jnp.take(run_start, k_s)

        # --- raw (unpadded) sorted positions and block tables
        cum = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(len_s).astype(jnp.int32)])  # [R_cap+1], cum[-1]=N
        # last query NW+1 (not NB*WB == NW): dead-sentinel runs count
        # into the last block; the empty-slot sentinel (2^30) stays out
        kk = jnp.searchsorted(
            wid_s,
            jnp.concatenate([jnp.arange(NB, dtype=jnp.int32) * WB,
                             jnp.array([NW + 1], jnp.int32)]),
            side="left")
        bounds = jnp.take(cum, kk)  # [NB+1] == sorted-path bounds
        pop = bounds[1:] - bounds[:-1]
        padded = ((pop + CHUNK - 1) // CHUNK) * CHUNK
        S = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(padded).astype(jnp.int32)])

        # --- padded destination start of each sorted run
        shift_b = S[:-1] - bounds[:-1]  # [NB]
        blk = jnp.clip(wid_s // WB, 0, NB - 1)
        dst_s = cum[:-1] + jnp.take(shift_b, blk)
        dst_s = jnp.where(len_s > 0, dst_s, Np)  # park empty slots OOB

        # --- seg(p): index (in dst order) of the run governing position p
        starts = jnp.zeros((Np,), jnp.int32).at[dst_s].add(1, mode="drop")
        seg = jnp.cumsum(starts) - 1  # [Np] >= 0 (first run starts at 0)
        off = jnp.arange(Np, dtype=jnp.int32) - jnp.take(dst_s, seg)
        valid = off < jnp.take(len_s, seg)
        src = jnp.where(valid, jnp.take(src_s, seg) + off, N)  # [Np]

        # --- assemble the padded stream with ONE [Np, 6] row gather.
        # Pad rows carry the sentinel window id NW (same as the sorted
        # path): they never extend a subtile's gather span, and
        # pure-pad/pure-dead chunks are skipped outright by the kernels
        pay = jnp.concatenate(
            [jnp.concatenate([u, dirs], axis=1),
             jnp.array([[0.5, 0.5, 0.5, 0.0, 0.0, 0.0]], jnp.float32)])
        g = jnp.take(pay, src, axis=0)  # [Np, 6]
        widf = jnp.where(
            valid, jnp.take(wid_s, seg).astype(jnp.float32),
            jnp.float32(NW))
        stream8 = jnp.stack(
            [g[:, 0], g[:, 1], g[:, 2], widf,
             g[:, 3], g[:, 4], g[:, 5], jnp.zeros((Np,), jnp.float32)])
        pts = stream8.reshape(8, NC, CHUNK).transpose(1, 0, 2)

        # --- inverse permutation, elementwise per original row
        dst_of_k = jax.lax.sort((k_s, dst_s), num_keys=1)[1]  # original-k
        rid = cs - 1
        inv_full = (jnp.take(dst_of_k, rid)
                    + iota_n - jnp.take(run_start, rid))
        return pts, src, inv_full, pop > 0

    def sort_branch(_):
        s = _sort_pack_sorted(x, dirs, H, tids, n_tables, True, dead)
        return s.pts, s.pidp, s.inv_full, s.visited

    pts, pidp, inv_full, visited = jax.lax.cond(
        cs[-1] <= R_cap, runs_branch, sort_branch, None)
    return SortedStream(
        pts=pts, meta=_stream_meta(pts, NC, NW), pidp=pidp,
        inv_full=inv_full, visited=visited,
    )


def _sort_pack_sorted(
    x: jax.Array,
    dirs: jax.Array,
    H: int,
    tids: jax.Array | None = None,
    n_tables: int = 1,
    need_inverse: bool = True,
    dead: jax.Array | None = None,
):
    """tids (optional) [N] int32: per-point table index for multi-table
    streams (the multi-tile renderer). Window ids become
    ``tid * NW + wid``; tile boundaries then coincide with block
    boundaries (NW % WB == 0), so every CHUNK stays within one tile's
    table slab and the kernel needs no changes.

    dead (optional) [N] bool: rows whose outputs are discarded
    downstream (masked rays, parked blend slots). They receive the
    sentinel window id NW — sorted after every real window, still
    copied into the last block (pids stay a full permutation, unsort
    unchanged), but excluded from every gather span; chunks made only
    of dead/pad rows are skipped whole by the kernels, which emit
    zeros for them. The reference analog is the boolean compression of
    masked rays (tile.py:940) — here the compression falls out of the
    sort the stream already pays for.

    Pipeline: ONE lax.sort by window id (8 operands), then the pad-align
    layout is a per-block forward shift of contiguous runs — done by the
    ``_pack_kernel`` DMA copy, NOT a second sort (sorts are the dominant
    cost on TPU, PERF.md)."""
    N = x.shape[0]
    NW, NB, _ = geometry(H)
    NW, NB = NW * n_tables, NB * n_tables
    Np, NC = padded_size(N, H, n_tables)
    u = (x + 2.0) * 0.25
    wid = window_id(u, H)
    if tids is not None:
        wid = wid + tids.astype(jnp.int32) * (NW // n_tables)
    if dead is not None:
        wid = jnp.where(dead, NW, wid)  # sentinel: one past the last
    pid = jnp.arange(N, dtype=jnp.int32)

    if _PERMUTE_MODE == "gather_narrow":
        # 2-operand sort; the 6 payload columns ride a row gather
        # instead (wins iff lax.sort cost scales with operand count
        # AND gathers are cheap — scripts/probe_sort_width.py)
        ws, pids = jax.lax.sort((wid, pid), num_keys=1)
        pay = jnp.take(jnp.concatenate([u, dirs], axis=1), pids, axis=0)
        u0, u1, u2 = pay[:, 0], pay[:, 1], pay[:, 2]
        d0, d1, d2 = pay[:, 3], pay[:, 4], pay[:, 5]
    else:
        ws, u0, u1, u2, d0, d1, d2, pids = jax.lax.sort(
            (wid, u[:, 0], u[:, 1], u[:, 2],
             dirs[:, 0], dirs[:, 1], dirs[:, 2], pid),
            num_keys=1,
        )

    # block boundaries in the sorted stream -> aligned positions (last
    # query NW+1, not NB*WB == NW: dead-sentinel rows count into the
    # last block so they are copied and their pids stay in the stream)
    bounds = jnp.searchsorted(
        ws,
        jnp.concatenate([jnp.arange(NB, dtype=jnp.int32) * WB,
                         jnp.array([NW + 1], jnp.int32)]),
        side="left",
    ).astype(jnp.int32)
    pop = bounds[1:] - bounds[:-1]  # [NB]
    padded = ((pop + CHUNK - 1) // CHUNK) * CHUNK
    S = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )  # padded block starts [NB+1]

    # per-output-chunk copy descriptor: the block containing the chunk,
    # its source run, and the pad wid. Tail chunks (past S[NB]) stay in
    # the LAST block (b_of_c clamps, and _stream_meta maps all-sentinel
    # chunks to boc NB-1): block visits must be monotone or the bwd
    # flush-on-change would rewrite earlier gradients with zeros.
    c0 = jnp.arange(NC, dtype=jnp.int32) * CHUNK
    b_of_c = jnp.clip(
        jnp.searchsorted(S, c0, side="right").astype(jnp.int32) - 1,
        0, NB - 1,
    )
    src_start = c0 - (S[b_of_c] - bounds[b_of_c])
    n_real = jnp.clip(S[b_of_c] + pop[b_of_c] - c0, 0, CHUNK)
    # pad rows carry the sentinel window id NW: never part of a gather
    # span, and pure-pad tail chunks are skipped whole by the kernels
    padwid = jnp.full((NC,), NW, jnp.int32)
    # the source is padded by CHUNK + 128 extra columns so the
    # (CHUNK+128)-wide aligned DMA at any legitimate aligned-down start
    # (<= N) stays in bounds; chunks with n_real == 0 may compute a
    # larger start — clamp them to N (all their columns are pad)
    if N >= 2**24:  # not an assert: must survive python -O (pids ride
        # the pack DMA as an f32 row, exact only below 2^24)
        raise ValueError(
            f"sort_pack stream of {N} rows exceeds the 2^24 f32-exact pid "
            "limit; split the call (render_image splits chunks "
            "automatically)")
    N_pad = ((N + CHUNK - 1) // CHUNK) * CHUNK + CHUNK + 128
    src_start = jnp.clip(src_start, 0, N)
    meta_c = jnp.stack(
        [src_start, n_real, padwid, jnp.full((NC,), N, jnp.int32)], -1
    )[:, None, :]  # [NC, 1, 4]

    zpad = jnp.zeros((N_pad - N,), jnp.float32)
    src = jnp.stack([
        jnp.concatenate([u0, zpad]), jnp.concatenate([u1, zpad]),
        jnp.concatenate([u2, zpad]),
        jnp.concatenate([ws.astype(jnp.float32), zpad]),
        jnp.concatenate([d0, zpad]), jnp.concatenate([d1, zpad]),
        jnp.concatenate([d2, zpad]),
        jnp.concatenate([pids.astype(jnp.float32), zpad]),
    ])  # [8, N_pad]; row 7 = pid as f32

    pts, pidp2 = pl.pallas_call(
        _pack_kernel,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, 1, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NC, 8, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((NC, 1, CHUNK), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, CHUNK + 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(meta_c, src)
    pidp = pidp2.reshape(Np)

    meta = _stream_meta(pts, NC, NW)

    # Permutation inverse. "sort" mode: not computed here — unsort_rows
    # derives it INSIDE its forward sort as one extra payload (the base
    # cost of a lax.sort dominates; a whole extra sort for it was the
    # single most wasteful op in the step). "gather" mode: the padded
    # position of sorted row j is elementwise from the block tables
    # (padpos = S[b] + j - bounds[b]), so ONE cheap 2-operand sort by
    # pid yields inv_full [N] in original-row order; every other
    # reorder in the step then becomes a row gather. ``need_inverse``
    # is kept for API stability and ignored.
    del need_inverse
    inv_full = None
    if _gather_mode():
        # block of sorted row j (dead-sentinel rows live in the LAST
        # block's padded range — clamp their NW // WB == NB over-index)
        b_j = jnp.minimum(ws // WB, NB - 1)
        padpos = S[b_j] - bounds[b_j] + jnp.arange(N, dtype=jnp.int32)
        inv_full = jax.lax.sort((pids, padpos), num_keys=1)[1]
    return SortedStream(
        pts=pts, meta=meta, pidp=pidp, inv_full=inv_full, visited=pop > 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sort_pack(
    x: jax.Array, dirs: jax.Array, H: int,
    dead: jax.Array | None = None,
) -> SortedStream:
    """Window-sort + pad-align points (and their viewdirs) for the kernel.

    x [N, 3] in [-2, 2]; dirs [N, 3]. Differentiable in both (the window
    assignment itself is piecewise-constant, gradient flows through the
    carried u/dir payloads). ``dead`` [N] bool routes discarded rows to
    the sentinel window (see _sort_pack_sorted) — their payload
    cotangents are zero by construction (outputs masked downstream).
    """
    return _sort_pack_impl(x, dirs, H, dead=dead)


def _sp_fwd(x, dirs, H, dead=None):
    out = _sort_pack_impl(x, dirs, H, dead=dead)
    return out, (out.pidp, out.inv_full, x.shape[0],
                 None if dead is None else dead.shape)


def _sp_bwd(H, res, g: SortedStream):
    pidp, inv_full, N, dead_shape = res
    # bool input -> float0 cotangent (None only when dead was None)
    d_dead = (None if dead_shape is None
              else np.zeros(dead_shape, jax.dtypes.float0))
    gp = g.pts  # [NC, 8, CHUNK] cotangent (float0 for int fields handled)
    Np = pidp.shape[0]
    cols = gp.transpose(1, 0, 2).reshape(8, Np)
    if inv_full is not None and _gather_mode():
        # row i's cotangent sits at padded position inv_full[i]
        picked = jnp.take(
            jnp.stack([cols[0], cols[1], cols[2],
                       cols[4], cols[5], cols[6]], axis=-1),
            inv_full[:N], axis=0)  # [N, 6]
        return picked[:, 0:3] * 0.25, picked[:, 3:6], d_dead
    out = jax.lax.sort(
        (pidp, cols[0], cols[1], cols[2], cols[4], cols[5], cols[6]),
        num_keys=1,
    )
    du = jnp.stack(out[1:4], axis=-1)[:N]
    ddirs = jnp.stack(out[4:7], axis=-1)[:N]
    return du * 0.25, ddirs, d_dead


sort_pack.defvjp(_sp_fwd, _sp_bwd)


def sort_pack_tables(
    x: jax.Array,
    dirs: jax.Array,
    tids: jax.Array,
    H: int,
    n_tables: int,
    dead: jax.Array | None = None,
) -> SortedStream:
    """Multi-table window-sort: points carry a per-point table index
    (tile id) and land in window ``tid*NW + wid`` of a concatenated
    feature stack [L, n_tables*H, F]; tile boundaries coincide with
    block boundaries, so every CHUNK stays within one tile's table
    slab. Used by the multi-tile renderer; ``sort_pack`` is the
    single-table training-path entry.
    """
    return _sort_pack_impl(
        x, dirs, H, tids=tids, n_tables=n_tables, need_inverse=False,
        dead=dead,
    )


# ---------------------------------------------------------------------------
# order restoration (unsort_rows) with custom VJP — both directions are
# explicit lax.sorts; never a scatter, never a row gather
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def unsort_rows(vals, pidp, inv_full, N: int):
    """Restore original row order of a padded-sorted [Np, D] array -> [N, D].

    ``inv_full`` may be None: the backward's inverse permutation is then
    computed INSIDE the forward sort as one extra payload column — a
    ~22 ms payload increment instead of a separate ~300 ms 2-operand
    lax.sort (base cost dominates sorts on this fabric, PERF.md r3).
    """
    D = vals.shape[1]
    if inv_full is not None and _gather_mode():
        return jnp.take(vals, inv_full[:N], axis=0)
    out = jax.lax.sort(
        (pidp,) + tuple(vals[:, i] for i in range(D)), num_keys=1)
    return jnp.stack(out[1:], axis=-1)[:N]


def _ur_fwd(vals, pidp, inv_full, N):
    D = vals.shape[1]
    Np = vals.shape[0]
    if _gather_mode():
        if inv_full is None:
            # callers on the gather path normally pass the inverse
            # sort_pack computed; derive it here once if they didn't
            inv_full = jax.lax.sort(
                (pidp, jnp.arange(Np, dtype=jnp.int32)), num_keys=1)[1]
        res = jnp.take(vals, inv_full[:N], axis=0)
        return res, (None, pidp, vals.shape)
    if inv_full is None:
        # one sort produces the unsorted values AND the inverse
        # permutation (position payload)
        out = jax.lax.sort(
            (pidp, jnp.arange(Np, dtype=jnp.int32))
            + tuple(vals[:, i] for i in range(D)),
            num_keys=1,
        )
        inv_full = out[1]
        res = jnp.stack(out[2:], axis=-1)[:N]
    else:
        res = unsort_rows(vals, pidp, inv_full, N)
    return res, (inv_full, None, vals.shape)


def _ur_bwd(N, res, g):
    inv_full, pidp, shape = res
    Np, D = shape
    if pidp is not None:  # gather mode: pad rows carry pidp == N -> 0
        gz = jnp.concatenate([g, jnp.zeros((1, D), g.dtype)], axis=0)
        return jnp.take(gz, jnp.minimum(pidp, N), axis=0), None, None
    gz = jnp.concatenate([g, jnp.zeros((Np - N, D), g.dtype)], axis=0)
    out = jax.lax.sort(
        (inv_full,) + tuple(gz[:, i] for i in range(D)), num_keys=1)
    return jnp.stack(out[1:], axis=-1), None, None


unsort_rows.defvjp(_ur_fwd, _ur_bwd)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _corner_setup(res_ref, pts_ref, l, t):
    """Per (chunk, level, 128-lane subtile): corner slots [8,128] i32,
    weights [8,128], and weight-derivative factors. All slicing happens
    on refs (Mosaic cannot dynamic_slice values)."""
    sl = pl.ds(t * 128, 128)
    rx = res_ref[l, 0].astype(jnp.float32)
    ry = res_ref[l, 1].astype(jnp.float32)
    rz = res_ref[l, 2].astype(jnp.float32)
    ux = pts_ref[0, 0:1, sl]
    uy = pts_ref[0, 1:2, sl]
    uz = pts_ref[0, 2:3, sl]
    vx = ux * (rx - 1.0)
    vy = uy * (ry - 1.0)
    vz = uz * (rz - 1.0)
    bx = jnp.floor(vx)
    by = jnp.floor(vy)
    bz = jnp.floor(vz)
    ox = vx - bx
    oy = vy - by
    oz = vz - bz
    # f32 -> uint32 is not lowerable in Mosaic; go via int32 (bl >= 0)
    ix = bx.astype(jnp.int32).astype(jnp.uint32)
    iy = by.astype(jnp.int32).astype(jnp.uint32)
    iz = bz.astype(jnp.int32).astype(jnp.uint32)
    hx0 = ix * jnp.uint32(PRIMES[0])
    hy0 = iy * jnp.uint32(PRIMES[1])
    hz0 = iz * jnp.uint32(PRIMES[2])
    hx1 = hx0 + jnp.uint32(PRIMES[0])
    hy1 = hy0 + jnp.uint32(PRIMES[1])
    hz1 = hz0 + jnp.uint32(PRIMES[2])

    bits = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cxb = ((bits >> 2) & 1) == 1  # x-major corner order (matches ref impl)
    cyb = ((bits >> 1) & 1) == 1
    czb = (bits & 1) == 1

    def sel(cb, one, zero):
        return jnp.where(cb, jnp.broadcast_to(one, (8, 128)),
                         jnp.broadcast_to(zero, (8, 128)))

    h = (
        sel(cxb, hx1, hx0).astype(jnp.uint32)
        ^ sel(cyb, hy1, hy0).astype(jnp.uint32)
        ^ sel(czb, hz1, hz0).astype(jnp.uint32)
    )
    h = h ^ (h >> jnp.uint32(9)) ^ (h >> jnp.uint32(18))
    slot = (h & jnp.uint32(W - 1)).astype(jnp.int32)

    wx = sel(cxb, ox, 1.0 - ox)
    wy = sel(cyb, oy, 1.0 - oy)
    wz = sel(czb, oz, 1.0 - oz)
    w8 = wx * wy * wz
    sx = jnp.where(cxb, 1.0, -1.0)
    sy = jnp.where(cyb, 1.0, -1.0)
    sz = jnp.where(czb, 1.0, -1.0)
    aux = (wx, wy, wz, sx, sy, sz, rx, ry, rz)
    return slot, w8, aux


# --- de-interleaved window layout (kernel-internal) -----------------------
# HBM keeps the canonical interleaved layout (entry-major, F innermost:
# flat = 2*slot + feature). The kernels relayout each slab ONCE per block
# visit into rows 0-3 = f0 (slot s at sublane s>>7, lane s&127) and rows
# 4-7 = f1, so the hot per-corner access needs ONE dynamic gather for
# both features (vs two) and the backward scatter needs ONE one-hot
# dot_general (vs two). The relayout itself uses static lane indices and
# is amortized over all chunks touching the block.

def _deinterleave_window(win8):
    # full-vreg gathers only (Mosaic take_along_axis needs [8,128])
    j = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    hi1 = j[:1] >= 64
    d0 = jnp.take_along_axis(win8, (2 * j) & 127, axis=1)
    d1 = jnp.take_along_axis(win8, (2 * j + 1) & 127, axis=1)
    rows = []
    for d in (d0, d1):
        for r in range(4):
            rows.append(jnp.where(hi1, d[2 * r + 1:2 * r + 2], d[2 * r:2 * r + 1]))
    return jnp.concatenate(rows, axis=0)


def _interleave_window(win_d):
    q = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    qh = q >> 1
    odd1 = (q[:1] & 1) == 1
    dA = jnp.take_along_axis(win_d, qh, axis=1)  # even output rows
    dB = jnp.take_along_axis(win_d, 64 + qh, axis=1)  # odd output rows
    rows = []
    for p in range(8):
        d = dA if (p & 1) == 0 else dB
        rows.append(
            jnp.where(odd1, d[4 + p // 2:5 + p // 2], d[p // 2:p // 2 + 1])
        )
    return jnp.concatenate(rows, axis=0)


def _relayout_slab(src, dst, L, transform):
    """Apply a per-window [8,128] transform across a [L, BLOCK_SUB, 128]
    slab (runs once per block visit)."""
    def body(i, _):
        l = i // WB
        w = i % WB
        sl = pl.ds(w * WIN_SUB, WIN_SUB)
        dst[l, sl, :] = transform(src[l, sl, :])
        return ()

    jax.lax.fori_loop(0, L * WB, body, ())


def _win_gather2(win_d, lane, sub):
    """De-interleaved window access: (f0, f1) values (1,128) for slot
    lanes ``lane`` (1,128) and sublane ids ``sub`` in [0,4)."""
    d = jnp.take_along_axis(win_d, jnp.broadcast_to(lane, (8, 128)), axis=1)
    f0 = d[0:1, :]
    f1 = d[4:5, :]
    for r in range(1, 4):
        m = sub == r
        f0 = jnp.where(m, d[r:r + 1, :], f0)
        f1 = jnp.where(m, d[4 + r:5 + r, :], f1)
    return f0, f1


def _corner_accum(win_d, slot, w8, mt, iota8, acc8):
    """One window's 8-corner gather-accumulate into an (8, 128)
    LAYOUT-ROW accumulator (rows 0-3: f0 at sublane r, rows 4-7: f1),
    reduced to (f0, f1) rows once per subtile by ``_accum_reduce``.

    Accumulating at full vreg width instead of the old per-corner
    (1, 128) select tree (see ``_win_gather2``, still used by the
    backward regather) roughly halves the per-corner VPU op count:
    gather + 3-op row mask + masked multiply-add, vs gather + 9-op
    select tree + 4 row ops. Shared by ``_fwd_kernel`` here and the
    fused forwards (ops/pallas/fused_train.py, fused_render.py) — any
    change to the corner gather must stay identical in all three."""
    for cc in range(8):
        lane = slot[cc:cc + 1, :] & 127
        sub8 = jnp.broadcast_to(slot[cc:cc + 1, :] >> 7, (8, 128))
        wmc = w8[cc:cc + 1, :] * mt
        d = jnp.take_along_axis(
            win_d, jnp.broadcast_to(lane, (8, 128)), axis=1)
        m8 = (iota8 == sub8) | (iota8 == sub8 + 4)
        acc8 = acc8 + jnp.where(m8, d * wmc, 0.0)
    return acc8


def _accum_reduce(acc8):
    """(8,128) layout-row accumulator -> ((1,128) f0, (1,128) f1)."""
    s0 = acc8[0:1, :] + acc8[1:2, :] + acc8[2:3, :] + acc8[3:4, :]
    s1 = acc8[4:5, :] + acc8[5:6, :] + acc8[6:7, :] + acc8[7:8, :]
    return s0, s1


def _corner_bwd_accum(win_d, slot, w8, aux, mt, g0t, g1t, iota8, iota128,
                      onehot_bf16, carry):
    """One window's 8-corner backward: the one-hot dot_general table
    scatter (accumulated into the returned ``dwin``) plus the regather
    for dL/dpoints (accumulated into the (du0, du1, du2) carry). Shared
    by ``_bwd_kernel`` here and the fused training backward
    (ops/pallas/fused_train.py).

    ``onehot_bf16``: build the scatter's one-hot matrix and per-point
    weighted-gradient operand in bf16 (accumulation stays f32 via the
    dot's preferred_element_type). The one-hot is built in f32 and CAST
    — a NATIVE bf16 construction (bf16 iota/lane compare) was tried in
    round 4 and Mosaic rejects the vector<...xbf16> cmpf on real-chip
    compile ("additional diagnostics skipped"), so the cast stays; it
    is exact in bf16 (0/1) and only the ``a`` operand rounds (2^-8
    relative). With the construction stuck in f32 the variant is
    throughput-neutral (measured round 3) and remains an option, not
    the default."""
    du0, du1, du2 = carry
    wx, wy, wz, sx, sy, sz, rx, ry, rz = aux
    dwin = jnp.zeros((8, 128), jnp.float32)
    adt = jnp.bfloat16 if onehot_bf16 else jnp.float32
    for cc in range(8):
        lane = slot[cc:cc + 1, :] & 127
        sub = slot[cc:cc + 1, :] >> 7
        wmc = w8[cc:cc + 1, :] * mt
        # de-interleaved scatter: f0 targets sublanes 0-3, f1 sublanes
        # 4-7, SAME lane -> one one-hot dot
        subm0 = iota8 == jnp.broadcast_to(sub, (8, 128))
        subm1 = iota8 == jnp.broadcast_to(sub + 4, (8, 128))
        ohl = jnp.where(
            iota128 == jnp.broadcast_to(lane, (128, 128)),
            1.0, 0.0).astype(adt)
        a = (
            jnp.where(subm0,
                      jnp.broadcast_to(wmc * g0t, (8, 128)), 0.0)
            + jnp.where(subm1,
                        jnp.broadcast_to(wmc * g1t, (8, 128)),
                        0.0)
        ).astype(adt)
        dwin = dwin + jax.lax.dot_general(
            a, ohl, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # regather for dL/dpoints
        f0, f1 = _win_gather2(win_d, lane, sub)
        gd = (f0 * g0t + f1 * g1t) * mt  # (1,128)
        du0 = du0 + gd * (
            sx[cc:cc + 1, :] * wy[cc:cc + 1, :]
            * wz[cc:cc + 1, :]) * (rx - 1.0)
        du1 = du1 + gd * (
            wx[cc:cc + 1, :] * sy[cc:cc + 1, :]
            * wz[cc:cc + 1, :]) * (ry - 1.0)
        du2 = du2 + gd * (
            wx[cc:cc + 1, :] * wy[cc:cc + 1, :]
            * sz[cc:cc + 1, :]) * (rz - 1.0)
    return dwin, (du0, du1, du2)


def _fwd_kernel(res_ref, meta_ref, pts_ref, feat_hbm, out_ref,
                slab, slab_d, prev, sem):
    c = pl.program_id(0)
    L = out_ref.shape[1]

    @pl.when(c == 0)
    def _():
        prev[0] = -1

    boc = meta_ref[0, 0, 0]

    @pl.when(boc != prev[0])
    def _():
        prev[0] = boc
        dma = pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(boc * BLOCK_SUB, BLOCK_SUB), :], slab, sem)
        dma.start()
        dma.wait()
        # bf16 tables (inference): the slab arrives half-width and is
        # widened during the per-block relayout; compute stays f32
        _relayout_slab(
            slab, slab_d, L,
            lambda w: _deinterleave_window(w.astype(jnp.float32)),
        )

    wmins = [meta_ref[0, t, 1] for t in range(SUBT)]
    spans = [meta_ref[0, t, 2] for t in range(SUBT)]
    # global window id of the feature shard's window 0 (table-parallel:
    # each device holds a contiguous block range; 0 when unsharded)
    wbase = meta_ref[0, 0, 3]
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    nwork = spans[0]
    for t in range(1, SUBT):
        nwork += spans[t]

    # chunks of only dead/pad sentinel rows: no gathers, no corner
    # setup — just zero the output block (the rows are discarded at
    # unsort or masked at composite; zeros keep the ×0 NaN-free)
    @pl.when(nwork == 0)
    def _():
        out_ref[0, :, :, :] = jnp.zeros((L, 2, CHUNK), jnp.float32)

    @pl.when(nwork > 0)
    def _():
        def level_body(l, _):
            for t in range(SUBT):  # static: sequencer iteration dominates
                sl = pl.ds(t * 128, 128)
                slot, w8, _aux = _corner_setup(res_ref, pts_ref, l, t)
                widf_t = pts_ref[0, 3:4, sl]
                wmin_t = wmins[t]
                span_t = spans[t]

                def k_body(k, acc8, slot=slot, w8=w8, widf_t=widf_t,
                           wmin_t=wmin_t):
                    w = wmin_t + k
                    wl = w - wbase - boc * WB
                    win_d = slab_d[l, pl.ds(wl * WIN_SUB, WIN_SUB), :]
                    mt = (widf_t == w.astype(jnp.float32)).astype(
                        jnp.float32)
                    return _corner_accum(win_d, slot, w8, mt, iota8, acc8)

                acc8 = jax.lax.fori_loop(
                    0, span_t, k_body, jnp.zeros((8, 128), jnp.float32))
                s0, s1 = _accum_reduce(acc8)
                out_ref[0, l, 0:1, sl] = s0
                out_ref[0, l, 1:2, sl] = s1
            return ()

        jax.lax.fori_loop(0, L, level_body, ())


def _bwd_kernel(res_ref, meta_ref, pts_ref, g_ref, feat_hbm,
                dacc_hbm, dpts_ref, slab, slab_d, daccs, stage, dpt, prev,
                sem_in, sem_out, *, onehot_bf16=False):
    """daccs accumulates in the DE-INTERLEAVED layout; flush interleaves
    it through ``stage`` back to the canonical HBM layout.

    ``onehot_bf16``: build the scatter's one-hot matrix and per-point
    weighted-gradient operand in bf16 (accumulation stays f32 via the
    dot's preferred_element_type). The one-hot is exact in bf16 (0/1);
    only the ``a`` operand rounds (2^-8 relative) — the one-hot
    CONSTRUCTION dominates the backward's VPU work, and bf16 halves its
    vreg count and doubles the MXU rate. Quality impact quantified by
    scripts/quality_ab.py (PERF.md round 3)."""
    c = pl.program_id(0)
    NC = pl.num_programs(0)
    L = g_ref.shape[1]

    @pl.when(c == 0)
    def _():
        prev[0] = -1

    boc = meta_ref[0, 0, 0]

    def flush(pb):
        _relayout_slab(daccs, stage, L, _interleave_window)
        dma = pltpu.make_async_copy(
            stage, dacc_hbm.at[:, pl.ds(pb * BLOCK_SUB, BLOCK_SUB), :],
            sem_out)
        dma.start()
        dma.wait()

    @pl.when(boc != prev[0])
    def _():
        @pl.when(prev[0] >= 0)
        def _():
            flush(prev[0])

        prev[0] = boc
        daccs[:, :, :] = jnp.zeros_like(daccs)
        dma = pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(boc * BLOCK_SUB, BLOCK_SUB), :],
            slab, sem_in)
        dma.start()
        dma.wait()
        _relayout_slab(slab, slab_d, L, _deinterleave_window)

    dpt[:, :] = jnp.zeros((8, CHUNK), jnp.float32)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    iota128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

    wmins = [meta_ref[0, t, 1] for t in range(SUBT)]
    spans = [meta_ref[0, t, 2] for t in range(SUBT)]
    wbase = meta_ref[0, 0, 3]
    nwork = spans[0]
    for t in range(1, SUBT):
        nwork += spans[t]

    # all-sentinel chunks: their cotangents are zero by construction
    # (outputs were zeros, masked downstream) — skip the whole scatter;
    # dpt stays zeroed, so dpts_ref gets the right zeros below
    @pl.when(nwork > 0)
    def _():
        def level_body(l, _):
            for t in range(SUBT):  # static: sequencer iteration dominates
                sl = pl.ds(t * 128, 128)
                slot, w8, aux = _corner_setup(res_ref, pts_ref, l, t)
                widf_t = pts_ref[0, 3:4, sl]
                g0t = g_ref[0, l, 0:1, sl]
                g1t = g_ref[0, l, 1:2, sl]
                wmin_t = wmins[t]
                span_t = spans[t]

                def k_body(k, carry, slot=slot, w8=w8, aux=aux,
                           widf_t=widf_t, g0t=g0t, g1t=g1t, wmin_t=wmin_t):
                    w = wmin_t + k
                    wl = w - wbase - boc * WB
                    win_d = slab_d[l, pl.ds(wl * WIN_SUB, WIN_SUB), :]
                    mt = (widf_t == w.astype(jnp.float32)).astype(
                        jnp.float32)
                    dwin, carry = _corner_bwd_accum(
                        win_d, slot, w8, aux, mt, g0t, g1t, iota8, iota128,
                        onehot_bf16, carry)
                    daccs[l, pl.ds(wl * WIN_SUB, WIN_SUB), :] += dwin
                    return carry

                zero = jnp.zeros((1, 128), jnp.float32)
                du0, du1, du2 = jax.lax.fori_loop(
                    0, span_t, k_body, (zero, zero, zero))
                dpt[0:1, sl] += du0
                dpt[1:2, sl] += du1
                dpt[2:3, sl] += du2
            return ()

        jax.lax.fori_loop(0, L, level_body, ())

    dpts_ref[0, :, :] = dpt[:, :]

    @pl.when(c == NC - 1)
    def _():
        flush(boc)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom-VJP lookup on the sorted stream
# ---------------------------------------------------------------------------

def _features_tiled(features: jax.Array) -> jax.Array:
    """[L, H, F=2] (or canonical flat [L, H*F]) -> [L, NW*8, 128]:
    window-major 8x128 vreg tiles of interleaved (entry, feature) lanes.

    The flat form is the training-state layout (see he.as_3d: trailing
    F=2 pays 8x tile padding whenever XLA materializes it); both
    reshape to the identical tiled view."""
    if features.ndim == 2:
        L, HF = features.shape
    else:
        L, H, F = features.shape
        assert F == 2, "kernel assumes F=2"
        HF = H * F
    return features.reshape(L, HF // 128, 128)


def _run_fwd(stream: SortedStream, features, resolutions):
    L = features.shape[0]
    NC = stream.pts.shape[0]
    assert features.dtype in (jnp.float32, jnp.bfloat16), features.dtype
    feat_t = _features_tiled(features)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # resolutions [L, 3]
            pl.BlockSpec((1, SUBT, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # feat_t
        ],
        out_specs=pl.BlockSpec((1, L, 2, CHUNK), lambda c: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NC, L, 2, CHUNK), jnp.float32),
        scratch_shapes=[
            # slab arrives in the table dtype (f32 training tables or
            # bf16 inference tables); slab_d is always widened f32
            pltpu.VMEM((L, BLOCK_SUB, 128), features.dtype),  # slab
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # slab_d
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(resolutions.astype(jnp.int32), stream.meta, stream.pts, feat_t)
    # [NC, L, 2, CHUNK] -> [Np, L*2]
    return out.transpose(0, 3, 1, 2).reshape(NC * CHUNK, L * 2)


def _run_bwd(stream: SortedStream, features, resolutions, g_sorted,
             onehot_bf16: bool = False):
    L = features.shape[0]
    NC = stream.pts.shape[0]
    assert features.dtype == jnp.float32, (
        "bf16 tables are inference-only (no backward)")
    feat_t = _features_tiled(features)
    g_k = g_sorted.reshape(NC, CHUNK, L, 2).transpose(0, 2, 3, 1)

    dacc, dpts = pl.pallas_call(
        functools.partial(_bwd_kernel, onehot_bf16=onehot_bf16),
        grid=(NC,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SUBT, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 2, CHUNK), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # dacc [L, NW*8, 128]
            pl.BlockSpec((1, 8, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(feat_t.shape, jnp.float32),
            jax.ShapeDtypeStruct((NC, 8, CHUNK), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # slab
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # slab_d
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # daccs (deint)
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # stage
            pltpu.VMEM((8, CHUNK), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(resolutions.astype(jnp.int32), stream.meta, stream.pts, g_k, feat_t)

    # unvisited blocks hold junk (never flushed) -> mask them out
    vis = jnp.repeat(stream.visited, BLOCK_SUB)  # [NW*8]
    d_features = jnp.where(vis[None, :, None], dacc, 0.0).reshape(
        features.shape
    )
    return dpts, d_features


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def hash_lookup_sorted(pts, meta, visited, features, resolutions,
                       onehot_bf16: bool = False):
    """Hash-encode a padded-sorted stream -> feats_sorted [Np, L*F].

    pts/meta/visited come from ``sort_pack`` (pass stream fields, not the
    struct, so cotangents line up). Differentiable wrt pts (rows 0-2,
    i.e. dL/du) and features. ``onehot_bf16``: backward one-hot scatter
    in bf16 with f32 accumulation (see _bwd_kernel; forward is identical
    either way).
    """
    stream = SortedStream(pts=pts, meta=meta, pidp=None, inv_full=None,
                          visited=visited)
    return _run_fwd(stream, features, resolutions)


def _hls_fwd(pts, meta, visited, features, resolutions, onehot_bf16):
    out = hash_lookup_sorted(pts, meta, visited, features, resolutions,
                             onehot_bf16)
    return out, (pts, meta, visited, features, resolutions)


def _hls_bwd(onehot_bf16, res, g):
    pts, meta, visited, features, resolutions = res
    stream = SortedStream(pts=pts, meta=meta, pidp=None, inv_full=None,
                          visited=visited)
    dpts, d_features = _run_bwd(stream, features, resolutions, g,
                                onehot_bf16=onehot_bf16)
    return dpts, None, None, d_features, None


hash_lookup_sorted.defvjp(_hls_fwd, _hls_bwd)


# ---------------------------------------------------------------------------
# drop-in original-order API (tests / simple callers)
# ---------------------------------------------------------------------------

def hash_encode_windowed(points, features, resolutions):
    """Drop-in replacement for ``hash_encode`` using the windowed hash.

    points [N, 3] in [-2, 2]; features [L, H, 2] or flat [L, H*2]
    (H pow2 >= 16384); resolutions [L, 3] int32. Returns [N, L*2] in
    the ORIGINAL order. Prefer sort_pack + hash_lookup_sorted +
    unsort_rows and keep the decoder in sorted space — the unsort here
    moves L*F columns.
    """
    N = points.shape[0]
    H = he.table_rows(features)
    stream = sort_pack(points, jnp.zeros_like(points), H)
    feats_s = hash_lookup_sorted(
        stream.pts, stream.meta, stream.visited, features, resolutions)
    return unsort_rows(feats_s, stream.pidp, stream.inv_full, N)
