"""Bisect the fwd windowed-hash kernel cost with median-of-5 timings.

Variants toggle one thing each relative to 'full':
  base      - full kernel (as shipped)
  c1        - 1 corner instead of 8
  nogather  - _win_gather replaced by win8[0:1]
  nosel     - gather without the 8-way sublane select (lane take only)
  nosetup   - constant slots/weights (skip _corner_setup per (l,t))
  l1        - single level iteration (out written for l=0 only)
  nokfori   - k loop replaced by single iteration (k=0)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scanerf_tpu.ops.pallas import hash_encode as hw

CHUNK, SUBT, WIN_SUB, BLOCK_SUB, WB = (
    hw.CHUNK, hw.SUBT, hw.WIN_SUB, hw.BLOCK_SUB, hw.WB)


def make_kernel(variant, L):
    ncorner = 1 if variant == "c1" else 8

    def gather(win8, flat):
        if variant == "nogather":
            return win8[0:1, :] * 0.5
        lane = jnp.broadcast_to(flat & 127, (8, 128))
        d = jnp.take_along_axis(win8, lane, axis=1)
        if variant == "nosel":
            return d[0:1, :]
        sub = flat >> 7
        e = d[0:1, :]
        for sidx in range(1, 8):
            e = jnp.where(sub == sidx, d[sidx:sidx + 1, :], e)
        return e

    def kernel(res_ref, meta_ref, pts_ref, feat_hbm, out_ref, slab, prev, sem):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            prev[0] = -1

        boc = meta_ref[0, 0, 0]

        @pl.when(boc != prev[0])
        def _():
            prev[0] = boc
            dma = pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(boc * BLOCK_SUB, BLOCK_SUB), :],
                slab, sem)
            dma.start()
            dma.wait()

        wmins = [meta_ref[0, t, 1] for t in range(SUBT)]
        spans = [meta_ref[0, t, 2] for t in range(SUBT)]
        nl = 1 if variant == "l1" else L

        def level_body(l, _):
            for t in range(SUBT):
                sl = pl.ds(t * 128, 128)
                if variant == "nosetup":
                    slot = jnp.full((8, 128), 7, jnp.int32)
                    w8 = jnp.full((8, 128), 0.125, jnp.float32)
                else:
                    slot, w8, _aux = hw._corner_setup(res_ref, pts_ref, l, t)
                widf_t = pts_ref[0, 3:4, sl]
                wmin_t = wmins[t]
                span_t = 1 if variant == "nokfori" else spans[t]

                def k_body(k, carry, slot=slot, w8=w8, widf_t=widf_t,
                           wmin_t=wmin_t):
                    s0, s1 = carry
                    w = wmin_t + k
                    wl = w - boc * WB
                    win8 = slab[l, pl.ds(wl * WIN_SUB, WIN_SUB), :]
                    mt = (widf_t == w.astype(jnp.float32)).astype(jnp.float32)
                    for cc in range(ncorner):
                        flat = slot[cc:cc + 1, :] * 2
                        wmc = w8[cc:cc + 1, :] * mt
                        s0 = s0 + wmc * gather(win8, flat)
                        s1 = s1 + wmc * gather(win8, flat + 1)
                    return s0, s1

                zero = jnp.zeros((1, 128), jnp.float32)
                s0, s1 = jax.lax.fori_loop(0, span_t, k_body, (zero, zero))
                out_ref[0, l, 0:1, sl] = s0
                out_ref[0, l, 1:2, sl] = s1
            return ()

        jax.lax.fori_loop(0, nl, level_body, ())

    return kernel


def run(variant, stream, feats, res):
    L, H, F = feats.shape
    NC = stream.pts.shape[0]
    feat_t = feats.reshape(L, H * F // 128, 128)
    return pl.pallas_call(
        make_kernel(variant, L),
        grid=(NC,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, CHUNK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, L, 2, CHUNK), lambda c: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NC, L, 2, CHUNK), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((L, BLOCK_SUB, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(res.astype(jnp.int32), stream.meta, stream.pts, feat_t)


def med(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    N, L, H = 2**19, 16, 2**21
    key = jax.random.PRNGKey(0)
    kp, kf = jax.random.split(key)
    uni = jax.random.uniform(kp, (N // 2, 3), minval=-2.0, maxval=2.0)
    clu = jnp.clip(0.3 * jax.random.normal(kf, (N // 2, 3)), -1.9, 1.9)
    pts = jnp.concatenate([uni, clu], axis=0)
    feats = 0.01 * jax.random.normal(kf, (L, H, 2), jnp.float32)
    res = jnp.asarray(np.stack(
        [(np.array([32, 32, 32]) * (2048 / 32) ** (i / 15)).astype(np.int32)
         for i in range(L)]))
    stream = jax.jit(functools.partial(hw.sort_pack, H=H))(
        pts, jnp.zeros_like(pts))
    stream = jax.tree_util.tree_map(jnp.asarray, stream)

    for variant in ["base", "nokfori", "l1", "c1", "nosetup", "nosel",
                    "nogather"]:
        fn = jax.jit(functools.partial(run, variant))
        t = med(fn, stream, feats, res)
        print(f"{variant:9s}: {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
