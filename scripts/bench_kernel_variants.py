"""Isolate the slow op in the fwd windowed-hash kernel.

Variants of the inner loop, measured at N=512K, H=2^21, L=16:
  full      - as shipped (take_along_axis LUT)
  notake    - replace LUT gather with a broadcast read (no gather)
  nokloop   - span loop runs exactly once
  nolevels  - single level
  empty     - kernel writes zeros (pipeline + DMA cost only)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scanerf_tpu.ops.pallas import hash_encode as hw

CHUNK = hw.CHUNK
BLOCK_LANES = hw.BLOCK_LANES
WB = hw.WB


def make_fwd(variant, L):
    def kernel(res_ref, meta_ref, pts_ref, feat_hbm, out_ref, slab, prev, sem):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            prev[0] = -1

        boc = meta_ref[0, 0, 0]
        wmin = meta_ref[0, 0, 1]
        span = meta_ref[0, 0, 2]

        if variant != "empty":
            @pl.when(boc != prev[0])
            def _():
                prev[0] = boc
                dma = pltpu.make_async_copy(
                    feat_hbm.at[:, :, pl.ds(boc * BLOCK_LANES, BLOCK_LANES)],
                    slab, sem)
                dma.start()
                dma.wait()

        widf = pts_ref[3:4, :]
        nl = 1 if variant == "nolevels" else L

        def level_body(l, _):
            slot, w8, _aux = hw._corner_setup(res_ref, pts_ref, l)
            idx0 = slot * 2
            kspan = 1 if variant == "nokloop" else span

            def k_body(k, acc):
                acc0, acc1 = acc
                w = wmin + k
                wl = w - boc * WB
                win = slab[l, :, pl.ds(wl * 128, 128)]
                winb = jnp.broadcast_to(win, (8, CHUNK))
                m = (widf == w.astype(jnp.float32)).astype(jnp.float32)
                if variant == "notake":
                    f0 = winb
                    f1 = winb * 0.5
                else:
                    f0 = jnp.take_along_axis(winb, idx0, axis=1)
                    f1 = jnp.take_along_axis(winb, idx0 + 1, axis=1)
                wm = w8 * jnp.broadcast_to(m, (8, CHUNK))
                acc0 = acc0 + jnp.sum(wm * f0, axis=0, keepdims=True)
                acc1 = acc1 + jnp.sum(wm * f1, axis=0, keepdims=True)
                return acc0, acc1

            zero = jnp.zeros((1, CHUNK), jnp.float32)
            acc0, acc1 = jax.lax.fori_loop(0, kspan, k_body, (zero, zero))
            out_ref[0, l, :, :] = jnp.concatenate([acc0, acc1], axis=0)
            return ()

        if variant == "empty":
            out_ref[0, :, :, :] = jnp.zeros(out_ref.shape[1:], jnp.float32)
        else:
            jax.lax.fori_loop(0, nl, level_body, ())

    return kernel


def run_variant(variant, prep, feats, res):
    L, H, F = feats.shape
    Np = prep["pts"].shape[1]
    NC = Np // CHUNK
    feat_il = feats.reshape(L, 1, H * F)
    return pl.pallas_call(
        make_fwd(variant, L),
        grid=(NC,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, CHUNK), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, L, 2, CHUNK), lambda c: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NC, L, 2, CHUNK), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((L, 1, BLOCK_LANES), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(res.astype(jnp.int32), prep["meta"], prep["pts"], feat_il)


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / n


def main():
    N = 2**19
    L, H = 16, 2**21
    key = jax.random.PRNGKey(0)
    kp, kf = jax.random.split(key)
    pts = jax.random.uniform(kp, (N, 3), minval=-2.0, maxval=2.0)
    feats = 0.01 * jax.random.normal(kf, (L, H, 2), jnp.float32)
    res = jnp.asarray(np.stack(
        [(np.array([32, 32, 32]) * (2048 / 32) ** (i / 15)).astype(np.int32)
         for i in range(L)]))

    prep = jax.jit(functools.partial(hw._prepare_stream, H=H))(pts)
    prep = jax.tree_util.tree_map(jnp.asarray, prep)
    span = np.asarray(prep["meta"][:, 0, 2])
    print(f"span stats: mean {span.mean():.1f} max {span.max()} "
          f"p99 {np.percentile(span, 99):.0f}")

    for variant in ["empty", "nolevels", "nokloop", "notake", "full"]:
        fn = jax.jit(functools.partial(run_variant, variant))
        t = timeit(fn, prep, feats, res)
        print(f"{variant:10s}: {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
