"""Fused hash-lookup + ShallowMLP decode for the TRAINING stream.

Training analog of ``fused_render.hash_decode_fused`` (the reference's
fused ``pts_inference<16>`` kernel, ``rendering_kernel.cu:466-621`` +
``decoder.h:169-218``) — but differentiable: exact gradients for the
hash tables, the decoder parameters, and the stream's point positions
AND view directions.

Unfused training path (models/field.py): fwd hash kernel writes feats
[Np, 32] to HBM -> XLA decoder fwd (reads feats, saves activations)
-> 8 composite columns -> ... -> XLA decoder bwd (writes d_feats
[Np, 32]) -> bwd hash kernel reads d_feats. The decoder stages cost
~75 ms of the 669 ms step (PERF.md round-3 budget) mostly in dispatch +
activation-residual traffic, not MXU time.

Fused: ONE forward kernel emits both the 8 columns and the feats (the
VJP residual — same HBM write the unfused fwd already does), and ONE
backward kernel reads (feats, g[8]) per chunk, runs the decoder
backward in-kernel, and feeds d_feats straight into the one-hot table
scatter — the [Np, 32] d_feats round-trip and both decoder dispatches
disappear.

The decoder backward is not hand-derived: the per-chunk decode is a
pure function of values, so the kernel body calls ``jax.vjp`` on it —
tracing inlines the pullback as plain vector/matmul ops Mosaic lowers
like any other kernel code. BARF per-level annealing is folded into the
first spatial layer outside the kernel (``pack_train_slab`` scales
sp0's input columns by wf — the first layer is linear in feats, so
decoder output and all gradients are identical, and the kernel's
d_feats is automatically w.r.t. the UNannealed features the table
scatter needs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scanerf_tpu.ops.pallas.fused_render import (
    PROWS,
    _R_BIAS,
    _R_DIR0,
    _R_DIR1,
    _R_DIR2,
    _R_HEADS,
    _R_SP0,
    _R_SP1,
    _gauss,
    _mm,
    _sh16,
    _sigmoid,
    _softplus,
    pack_decoder_slabs,
)
from scanerf_tpu.ops.pallas.hash_encode import (
    BLOCK_SUB,
    CHUNK,
    SUBT,
    WB,
    WIN_SUB,
    SortedStream,
    _accum_reduce,
    _corner_accum,
    _corner_bwd_accum,
    _corner_setup,
    _deinterleave_window,
    _features_tiled,
    _interleave_window,
    _interpret,
    _relayout_slab,
    _win_gather2,
)


def pack_train_slab(decoder_params: dict, wf: jax.Array) -> jax.Array:
    """Decoder pytree + per-level annealing weights wf [L] ->
    [PROWS, 128] f32 slab with wf folded into spatial0's input columns.

    Pure jnp (differentiable): the custom-VJP kernel returns d_slab and
    autodiff maps it back through this packing to the decoder pytree
    cotangents (and drops the non-differentiated wf path)."""
    slab = pack_decoder_slabs(
        jax.tree_util.tree_map(lambda x: x[None], decoder_params)
    )[0]
    wf2 = jnp.repeat(wf, 2)  # [2L] feature-channel weights
    return slab.at[_R_SP0:_R_SP0 + 64, 0:32].multiply(wf2[None, :])


def _decode_train_chunk(pslab, feats, dirs3):
    """ShallowMLP on one chunk -> the 8 training composite columns:
    row 0 sigma, 1-3 diffuse, 4-6 tint*specular (premultiplied), 7 the
    specular channel-mean square (the L2 reg rides one column — see
    models/field.py _render_rays_windowed).

    Pure function of VALUES (no refs) so the backward kernel can get
    its exact pullback from jax.vjp."""
    b = lambda j, n: pslab[_R_BIAS:_R_BIAS + n, j:j + 1]

    h = _gauss(_mm(pslab[_R_SP0:_R_SP0 + 64, 0:32], feats) + b(0, 64))
    H2 = _mm(pslab[_R_SP1:_R_SP1 + 64, 0:64], h) + b(1, 64)
    h_geo = H2[0:32, :]
    h_dir = H2[32:64, :]

    heads = _mm(pslab[_R_HEADS:_R_HEADS + 8, 0:32], h_geo)
    hb = b(4, 8)
    sigma = _softplus(heads[0:1, :] + hb[0:1])
    diffuse = _sigmoid(heads[1:4, :] + hb[1:4])
    tint = _sigmoid(heads[4:7, :] + hb[4:7])

    dx = dirs3[0:1, :]
    dy = dirs3[1:2, :]
    dz = dirs3[2:3, :]
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-16)
    nrm = 1.0 / (1.0 / inv + 1e-8)  # matches decoder: d / (|d| + 1e-8)
    sh = jnp.concatenate(_sh16(dx * nrm, dy * nrm, dz * nrm), axis=0)

    d0 = (
        _mm(pslab[_R_DIR0:_R_DIR0 + 64, 0:32], h_dir)
        + _mm(pslab[_R_DIR0:_R_DIR0 + 64, 32:48], sh)
        + b(2, 64)
    )
    d1 = _gauss(d0)
    d2 = _gauss(_mm(pslab[_R_DIR1:_R_DIR1 + 64, 0:64], d1) + b(3, 64))
    spec = _sigmoid(
        _mm(pslab[_R_DIR2:_R_DIR2 + 8, 0:64], d2)[0:3, :] + b(5, 8)[0:3]
    )
    spec2 = jnp.mean(spec * spec, axis=0, keepdims=True)
    return jnp.concatenate([sigma, diffuse, tint * spec, spec2], axis=0)


# ---------------------------------------------------------------------------
# forward kernel: hash gather (static level loop) + in-kernel decode
# ---------------------------------------------------------------------------

def _ft_fwd_kernel(res_ref, meta_ref, pts_ref, feat_hbm, pslab_ref,
                   cols_ref, feats_ref, slab, slab_d, prev, sem):
    c = pl.program_id(0)
    L = feats_ref.shape[1]

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
        # slab is declared f32 (the training kernel rejects bf16
        # tables), so no widening cast — unlike fused_render's slab
        _relayout_slab(slab, slab_d, L, _deinterleave_window)

    wmins = [meta_ref[0, t, 1] for t in range(SUBT)]
    spans = [meta_ref[0, t, 2] for t in range(SUBT)]
    wbase = meta_ref[0, 0, 3]
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    nwork = spans[0]
    for t in range(1, SUBT):
        nwork += spans[t]

    # all-sentinel chunks (masked rays routed dead, pads): skip gathers
    # and the decoder — zero cols AND the feats residual (the backward
    # reads feats of skipped chunks only through its own skip, but
    # zeros keep any debug path NaN-free)
    @pl.when(nwork == 0)
    def _():
        for l in range(L):
            feats_ref[0, l, :, :] = jnp.zeros((2, CHUNK), jnp.float32)
        cols_ref[0, :, :] = jnp.zeros((8, CHUNK), jnp.float32)

    @pl.when(nwork > 0)
    def _():
        # STATIC level loop (fused_render pattern): rows ride registers
        # into the decoder; the per-level stores double as the VJP
        # residual
        rows = []
        for l in range(L):
            subt_rows = []
            for t in range(SUBT):
                sl = pl.ds(t * 128, 128)
                slot, w8, _aux = _corner_setup(res_ref, pts_ref, l, t)
                widf_t = pts_ref[0, 3:4, sl]
                wmin_t = wmins[t]
                span_t = spans[t]

                def k_body(k, acc8, slot=slot, w8=w8, widf_t=widf_t,
                           wmin_t=wmin_t, l=l):
                    w = wmin_t + k
                    wl = w - wbase - boc * WB
                    win_d = slab_d[l, pl.ds(wl * WIN_SUB, WIN_SUB), :]
                    mt = (widf_t == w.astype(jnp.float32)).astype(
                        jnp.float32)
                    return _corner_accum(win_d, slot, w8, mt, iota8, acc8)

                acc8 = jax.lax.fori_loop(
                    0, span_t, k_body, jnp.zeros((8, 128), jnp.float32))
                s0, s1 = _accum_reduce(acc8)
                feats_ref[0, l, 0:1, sl] = s0
                feats_ref[0, l, 1:2, sl] = s1
                subt_rows.append((s0, s1))
            rows.append(jnp.concatenate([r[0] for r in subt_rows], axis=1))
            rows.append(jnp.concatenate([r[1] for r in subt_rows], axis=1))

        feats = jnp.concatenate(rows, axis=0)  # [2L, CHUNK]
        dirs3 = pts_ref[0, 4:7, :]
        cols_ref[0, :, :] = _decode_train_chunk(
            pslab_ref[:, :], feats, dirs3)


# ---------------------------------------------------------------------------
# backward kernel: in-kernel decoder pullback, then the one-hot scatter
# ---------------------------------------------------------------------------

def _ft_bwd_kernel(res_ref, meta_ref, pts_ref, feats_ref, g_ref, feat_hbm,
                   pslab_ref, dacc_hbm, dpts_ref, dps_ref,
                   slab, slab_d, daccs, stage, dpt, dfv, prev,
                   sem_in, sem_out, *, onehot_bf16=False):
    """Structure mirrors hash_encode._bwd_kernel (same slab/flush
    machinery, same scatter loop); the decoder pullback replaces g_ref
    as the source of per-level cotangents."""
    c = pl.program_id(0)
    NC = pl.num_programs(0)
    L = feats_ref.shape[1]

    @pl.when(c == 0)
    def _():
        prev[0] = -1
        dps_ref[:, :] = jnp.zeros((PROWS, 128), jnp.float32)

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

    wmins = [meta_ref[0, t, 1] for t in range(SUBT)]
    spans = [meta_ref[0, t, 2] for t in range(SUBT)]
    wbase = meta_ref[0, 0, 3]
    nwork = spans[0]
    for t in range(1, SUBT):
        nwork += spans[t]

    # all-sentinel chunks: cotangents are zero by construction (their
    # forward cols were zeros, masked at composite) — skip the decoder
    # pullback AND the scatter; only the zero dpts store remains
    @pl.when(nwork == 0)
    def _():
        dpts_ref[0, :, :] = jnp.zeros((8, CHUNK), jnp.float32)

    @pl.when(nwork > 0)
    def _():
        # --- decoder pullback: d(8 cols) -> (d_pslab, d_feats, d_dirs)
        feats = jnp.concatenate(
            [feats_ref[0, l, f:f + 1, :] for l in range(L) for f in (0, 1)],
            axis=0,
        )  # [2L, CHUNK]
        dirs3 = pts_ref[0, 4:7, :]
        _, pull = jax.vjp(
            _decode_train_chunk, pslab_ref[:, :], feats, dirs3)
        d_ps, d_f, d_d3 = pull(g_ref[0, :, :])
        dps_ref[:, :] += d_ps
        # d_feats to scratch so the fori level loop can index it
        # dynamically
        for l in range(L):
            dfv[l, 0:1, :] = d_f[2 * l:2 * l + 1, :]
            dfv[l, 1:2, :] = d_f[2 * l + 1:2 * l + 2, :]

        dpt[:, :] = jnp.zeros((8, CHUNK), jnp.float32)
        dpt[4:7, :] = d_d3
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        iota128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

        def level_body(l, _):
            for t in range(SUBT):
                sl = pl.ds(t * 128, 128)
                slot, w8, aux = _corner_setup(res_ref, pts_ref, l, t)
                widf_t = pts_ref[0, 3:4, sl]
                g0t = dfv[l, 0:1, sl]
                g1t = dfv[l, 1:2, sl]
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
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _run_fwd(stream: SortedStream, features, resolutions, pslab):
    L = resolutions.shape[0]
    NC = stream.pts.shape[0]
    assert features.dtype == jnp.float32, features.dtype
    feat_t = _features_tiled(features)
    cols, feats = pl.pallas_call(
        _ft_fwd_kernel,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # resolutions [L, 3]
            pl.BlockSpec((1, SUBT, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # feat_t
            pl.BlockSpec((PROWS, 128), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),  # pslab (persistent)
        ],
        out_specs=(
            pl.BlockSpec((1, 8, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 2, CHUNK), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NC, 8, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((NC, L, 2, CHUNK), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # slab
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # slab_d
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(resolutions.astype(jnp.int32), stream.meta, stream.pts, feat_t, pslab)
    return cols.transpose(0, 2, 1).reshape(NC * CHUNK, 8), feats


def _run_bwd(stream: SortedStream, features, resolutions, pslab, feats,
             g_cols, onehot_bf16: bool = False):
    L = resolutions.shape[0]
    NC = stream.pts.shape[0]
    feat_t = _features_tiled(features)
    g_k = g_cols.reshape(NC, CHUNK, 8).transpose(0, 2, 1)

    dacc, dpts, dps = pl.pallas_call(
        functools.partial(_ft_bwd_kernel, onehot_bf16=onehot_bf16),
        grid=(NC,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SUBT, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 2, CHUNK), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # feats residual
            pl.BlockSpec((1, 8, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),  # g
            pl.BlockSpec(memory_space=pl.ANY),  # feat_t
            pl.BlockSpec((PROWS, 128), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),  # pslab
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # dacc
            pl.BlockSpec((1, 8, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PROWS, 128), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),  # d_pslab accumulator
        ),
        out_shape=(
            jax.ShapeDtypeStruct(feat_t.shape, jnp.float32),
            jax.ShapeDtypeStruct((NC, 8, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((PROWS, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # slab
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # slab_d
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # daccs
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # stage
            pltpu.VMEM((8, CHUNK), jnp.float32),  # dpt
            pltpu.VMEM((L, 2, CHUNK), jnp.float32),  # dfv (d_feats)
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(resolutions.astype(jnp.int32), stream.meta, stream.pts, feats, g_k,
      feat_t, pslab)

    vis = jnp.repeat(stream.visited, BLOCK_SUB)
    d_features = jnp.where(vis[None, :, None], dacc, 0.0).reshape(
        features.shape
    )
    return dpts, d_features, dps


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def hash_decode_train(pts, meta, visited, features, resolutions, pslab,
                      onehot_bf16: bool = False):
    """Fused lookup+decode on a padded-sorted stream -> cols [Np, 8]
    (sigma, diffuse, tint*specular, specular-square channel mean).

    Differentiable wrt pts (position rows 0-2 AND direction rows 4-6),
    features (either table layout), and the wf-scaled decoder slab from
    ``pack_train_slab``. ``onehot_bf16`` as in hash_lookup_sorted."""
    stream = SortedStream(pts=pts, meta=meta, pidp=None, inv_full=None,
                          visited=visited)
    cols, _ = _run_fwd(stream, features, resolutions, pslab)
    return cols


def _hdt_fwd(pts, meta, visited, features, resolutions, pslab, onehot_bf16):
    stream = SortedStream(pts=pts, meta=meta, pidp=None, inv_full=None,
                          visited=visited)
    cols, feats = _run_fwd(stream, features, resolutions, pslab)
    return cols, (pts, meta, visited, features, resolutions, pslab, feats)


def _hdt_bwd(onehot_bf16, res, g):
    pts, meta, visited, features, resolutions, pslab, feats = res
    stream = SortedStream(pts=pts, meta=meta, pidp=None, inv_full=None,
                          visited=visited)
    dpts, d_features, dps = _run_bwd(
        stream, features, resolutions, pslab, feats, g,
        onehot_bf16=onehot_bf16,
    )
    return dpts, None, None, d_features, None, dps


hash_decode_train.defvjp(_hdt_fwd, _hdt_bwd)
