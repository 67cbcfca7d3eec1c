"""Fused hash-lookup + ShallowMLP decode kernel (renderer megakernel).

TPU rebuild of the reference's fused ``pts_inference<16>`` renderer
kernel (``hashgrid/src/rendering_kernel.cu:466-621`` +
``include/decoder.h:169-218``): hash features never leave VMEM — per
1024-point chunk, the windowed hash gather (same machinery as
``hash_encode._fwd_kernel``) accumulates the 32 feature rows into a VMEM
buffer, then the full ShallowMLP (spatial MLP, sigma/diffuse/tint heads,
SH-16 directional branch) runs as in-kernel MXU matmuls on the
[32, 1024] chunk, and only FOUR output rows (sigma, premultiplied rgb =
diffuse + tint*specular) are written to HBM. This removes the
[Np, 32] feature round-trip that dominated the unfused renderer chunk
budget (PERF.md round 2: 232 ms hash + 44 ms decoder of a 607 ms chunk).

Per-tile decoder parameters ride a packed [T, PROWS, 128] slab
(``pack_decoder_slabs``); each chunk lies inside one tile's table range
(tile boundaries coincide with window-block boundaries in the
multi-table stream), so the slab is DMA'd once per tile change exactly
like the feature block slab.

Forward-only (inference): the renderer never differentiates. The
training stream keeps the unfused decoder (it needs the activations for
the backward anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scanerf_tpu.ops.pallas.hash_encode import (
    BLOCK_SUB,
    CHUNK,
    SUBT,
    W,
    WB,
    WIN_SUB,
    _accum_reduce,
    _corner_accum,
    _corner_setup,
    _deinterleave_window,
    _features_tiled,
    _interpret,
    _relayout_slab,
    _win_gather2,
    SortedStream,
)

# packed decoder-param slab row layout (f32 [PROWS, 128] per tile)
_R_SP0 = 0        # spatial0^T  [64, 0:32]
_R_SP1 = 64       # spatial1^T  [64, 0:64]
_R_HEADS = 128    # heads^T     [8]: row 0 sigma, 1-3 diffuse, 4-6 tint, cols 0:32
_R_DIR0 = 136     # dir0^T      [64, 0:48] (0:32 h_dir part, 32:48 SH part)
_R_DIR1 = 200     # dir1^T      [64, 0:64]
_R_DIR2 = 264     # dir2^T      [8]: rows 0-2 specular, cols 0:64
_R_BIAS = 272     # biases      [64]: col 0 b_sp0, 1 b_sp1, 2 b_dir0,
#                                3 b_dir1, 4 heads (rows 0:7), 5 b_dir2 (rows 0:3)
PROWS = 336

_GAUSS_K = -1.0 / (2.0 * 0.1 * 0.1)  # GaussianAct sigma=0.1

# SH degree-3 constants (utils/sh.py == network.py:8-77)
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def pack_decoder_slabs(decoders) -> jax.Array:
    """Stacked decoder pytree (leaves [T, ...], models/decoder.py layout)
    -> [T, PROWS, 128] f32 param slabs for the fused kernel."""
    T = decoders["spatial0"]["w"].shape[0]
    slab = jnp.zeros((T, PROWS, 128), jnp.float32)

    def put(s, r0, mat):  # mat [T, out, in] -> rows r0:r0+out, cols 0:in
        o, i = mat.shape[1], mat.shape[2]
        return s.at[:, r0:r0 + o, 0:i].set(mat)

    wT = lambda name: jnp.transpose(decoders[name]["w"], (0, 2, 1))
    slab = put(slab, _R_SP0, wT("spatial0"))
    slab = put(slab, _R_SP1, wT("spatial1"))
    heads = jnp.concatenate(
        [wT("sigma"), wT("diffuse"), wT("tint")], axis=1
    )  # [T, 7, 32]
    slab = put(slab, _R_HEADS, heads)
    slab = put(slab, _R_DIR0, wT("dir0"))
    slab = put(slab, _R_DIR1, wT("dir1"))
    slab = put(slab, _R_DIR2, wT("dir2"))
    bias_cols = [
        decoders["spatial0"]["b"],  # [T, 64]
        decoders["spatial1"]["b"],
        decoders["dir0"]["b"],
        decoders["dir1"]["b"],
        jnp.concatenate(
            [decoders["sigma"]["b"], decoders["diffuse"]["b"],
             decoders["tint"]["b"]], axis=1
        ),  # [T, 7]
        decoders["dir2"]["b"],  # [T, 3]
    ]
    for j, b in enumerate(bias_cols):
        slab = slab.at[:, _R_BIAS:_R_BIAS + b.shape[1], j].set(b)
    return slab


def _gauss(x):
    return jnp.exp(x * x * _GAUSS_K)


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def _softplus(x):
    # numerically stable log1p(exp(x))
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _sh16(dx, dy, dz):
    """Degree-3 SH rows: 16 x [1, CHUNK] from normalized dir rows."""
    one = jnp.ones_like(dx)
    xx, yy, zz = dx * dx, dy * dy, dz * dz
    xy, yz, xz = dx * dy, dy * dz, dx * dz
    return [
        _C0 * one,
        _C1 * dy, _C1 * dz, _C1 * dx,
        _C2[0] * xy, _C2[1] * yz, _C2[2] * (2.0 * zz - xx - yy),
        _C2[3] * xz, _C2[4] * (xx - yy),
        _C3[0] * dy * (3.0 * xx - yy),
        _C3[1] * xy * dz,
        _C3[2] * dy * (4.0 * zz - xx - yy),
        _C3[3] * dz * (2.0 * zz - 3.0 * xx - 3.0 * yy),
        _C3[4] * dx * (4.0 * zz - xx - yy),
        _C3[5] * dz * (xx - yy),
        _C3[6] * dx * (xx - 3.0 * yy),
    ]


def _mm(wT, x):
    """[O, I] @ [I, CHUNK] -> [O, CHUNK] f32 on the MXU."""
    return jax.lax.dot_general(
        wT, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _decode_chunk(pslab, feats, pts_ref):
    """ShallowMLP on one chunk: feats [32, CHUNK] + dirs from pts_ref
    rows 4-6 -> (sigma, r, g, b premult color) rows [4, CHUNK]."""
    b = lambda j, n: pslab[_R_BIAS:_R_BIAS + n, j:j + 1]

    h = _gauss(_mm(pslab[_R_SP0:_R_SP0 + 64, 0:32], feats) + b(0, 64))
    H2 = _mm(pslab[_R_SP1:_R_SP1 + 64, 0:64], h) + b(1, 64)
    h_geo = H2[0:32, :]
    h_dir = H2[32:64, :]

    heads = _mm(pslab[_R_HEADS:_R_HEADS + 8, 0:32], h_geo)  # [8, CHUNK]
    hb = b(4, 8)
    sigma = _softplus(heads[0:1, :] + hb[0:1])
    diffuse = _sigmoid(heads[1:4, :] + hb[1:4])
    tint = _sigmoid(heads[4:7, :] + hb[4:7])

    dx = pts_ref[0, 4:5, :]
    dy = pts_ref[0, 5:6, :]
    dz = pts_ref[0, 6:7, :]
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-16)
    # match decoder.apply_decoder: dirs / (|dirs| + 1e-8)
    nrm = 1.0 / (1.0 / inv + 1e-8)
    sh = jnp.concatenate(
        _sh16(dx * nrm, dy * nrm, dz * nrm), axis=0
    )  # [16, CHUNK]

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

    color = diffuse + tint * spec
    return jnp.concatenate([sigma, color], axis=0)  # [4, CHUNK]


def _fused_kernel(res_ref, meta_ref, pts_ref, feat_hbm, dp_hbm,
                  out_ref, slab, slab_d, pslab, prev,
                  sem, sem_p):
    c = pl.program_id(0)
    L = res_ref.shape[0]

    @pl.when(c == 0)
    def _():
        prev[0] = -1
        prev[1] = -1

    boc = meta_ref[0, 0, 0]
    # per-chunk tile id rides meta[c, 1, 3] (an unused slot — only
    # [c, 0, 3] is read, as wbase); Mosaic cannot lower size-1 SMEM
    # blocks for a separate rank-1/rank-2 operand
    tid = meta_ref[0, 1, 3]

    @pl.when(boc != prev[0])
    def _():
        prev[0] = boc
        dma = pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(boc * BLOCK_SUB, BLOCK_SUB), :], slab, sem)
        dma.start()
        dma.wait()
        _relayout_slab(
            slab, slab_d, L,
            lambda w: _deinterleave_window(w.astype(jnp.float32)),
        )

    @pl.when(tid != prev[1])
    def _():
        prev[1] = tid
        dma = pltpu.make_async_copy(dp_hbm.at[tid], pslab, sem_p)
        dma.start()
        dma.wait()

    wmins = [meta_ref[0, t, 1] for t in range(SUBT)]
    spans = [meta_ref[0, t, 2] for t in range(SUBT)]
    wbase = meta_ref[0, 0, 3]
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    nwork = spans[0]
    for t in range(1, SUBT):
        nwork += spans[t]

    # chunks of only dead/pad sentinel rows (parked blend slots, pads):
    # skip gathers AND the decoder matmuls — emit zeros (sigma 0,
    # color 0), which the blend's masks discard anyway
    @pl.when(nwork == 0)
    def _():
        out_ref[0, :, :] = jnp.zeros((4, CHUNK), jnp.float32)

    @pl.when(nwork > 0)
    def _():
        # STATIC level loop: the feature rows are carried in registers
        # and concatenated (a [2L, CHUNK] scratch would need a
        # dynamic-sublane store per level, which Mosaic cannot lower:
        # "dynamic store with unaligned indices")
        def one_level(l):
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
                subt_rows.append((s0, s1))
            f0 = jnp.concatenate([r[0] for r in subt_rows], axis=1)
            f1 = jnp.concatenate([r[1] for r in subt_rows], axis=1)
            return f0, f1

        rows = []
        for l in range(L):
            f0, f1 = one_level(l)
            rows.append(f0)
            rows.append(f1)
        feats = jnp.concatenate(rows, axis=0)  # [2L, CHUNK]
        out_ref[0, :, :] = _decode_chunk(pslab, feats, pts_ref)


def hash_decode_fused(
    stream: SortedStream,
    chunk_tids: jax.Array,  # [NC] int32 tile id per chunk
    features: jax.Array,  # [L, T*H, F] or flat [L, T*H*F] table stack
    resolutions: jax.Array,  # [L, 3]
    dec_slabs: jax.Array,  # [T, PROWS, 128] from pack_decoder_slabs
) -> jax.Array:
    """Sorted-stream fused lookup+decode -> [Np, 4] (sigma, premult rgb).

    Forward-only. Output rows for pad points are garbage (their pids
    point past N and are dropped by unsort_rows).
    """
    L = features.shape[0]
    NC = stream.pts.shape[0]
    assert features.dtype in (jnp.float32, jnp.bfloat16), features.dtype
    feat_t = _features_tiled(features)
    out = pl.pallas_call(
        _fused_kernel,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # resolutions
            pl.BlockSpec((1, SUBT, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),  # meta (+tid in [1,3])
            pl.BlockSpec((1, 8, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # feat_t
            pl.BlockSpec(memory_space=pl.ANY),  # dec_slabs
        ],
        out_specs=pl.BlockSpec((1, 4, CHUNK), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NC, 4, CHUNK), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((L, BLOCK_SUB, 128), features.dtype),  # slab
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),  # slab_d
            pltpu.VMEM((PROWS, 128), jnp.float32),  # pslab
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(
        resolutions.astype(jnp.int32),
        stream.meta.at[:, 1, 3].set(chunk_tids.astype(jnp.int32)),
        stream.pts, feat_t, dec_slabs,
    )
    # [NC, 4, CHUNK] -> [Np, 4]
    return out.transpose(0, 2, 1).reshape(NC * CHUNK, 4)
