"""Find the per-grid-step overhead source in the chunk-grid kernel."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NC = 4608
CHUNK = 128


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


def run(case):
    pts = jnp.ones((4, NC * CHUNK), jnp.float32)
    meta = jnp.zeros((NC, 8, 4), jnp.int32)
    big = jnp.ones((16, 1, 2**21 * 2), jnp.float32)

    if case == "copy":
        def k(pts_ref, out_ref):
            out_ref[0, :, :, :] = (
                jnp.zeros((16, 2, CHUNK), jnp.float32) + pts_ref[0, 0]
            )
        in_specs = [pl.BlockSpec((4, CHUNK), lambda c: (0, c))]
        args = (pts,)
    elif case == "copy+meta":
        def k(meta_ref, pts_ref, out_ref):
            out_ref[0, :, :, :] = (
                jnp.zeros((16, 2, CHUNK), jnp.float32)
                + meta_ref[0, 0, 0].astype(jnp.float32)
            )
        in_specs = [
            pl.BlockSpec((1, 8, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, CHUNK), lambda c: (0, c)),
        ]
        args = (meta, pts)
    elif case == "copy+any":
        def k(pts_ref, big_ref, out_ref):
            out_ref[0, :, :, :] = (
                jnp.zeros((16, 2, CHUNK), jnp.float32) + pts_ref[0, 0]
            )
        in_specs = [
            pl.BlockSpec((4, CHUNK), lambda c: (0, c)),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args = (pts, big)
    elif case == "copy+scratch":
        def k(pts_ref, out_ref, slab, prev, sem):
            out_ref[0, :, :, :] = (
                jnp.zeros((16, 2, CHUNK), jnp.float32) + pts_ref[0, 0]
            )
        return pl.pallas_call(
            k, grid=(NC,),
            in_specs=[pl.BlockSpec((4, CHUNK), lambda c: (0, c))],
            out_specs=pl.BlockSpec((1, 16, 2, CHUNK),
                                   lambda c: (c, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NC, 16, 2, CHUNK), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((16, 1, 64 * 64 * 2), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(pts)
    elif case == "small-out":
        def k(pts_ref, out_ref):
            out_ref[:, :] = pts_ref[:, :]
        return pl.pallas_call(
            k, grid=(NC,),
            in_specs=[pl.BlockSpec((4, CHUNK), lambda c: (0, c))],
            out_specs=pl.BlockSpec((4, CHUNK), lambda c: (0, c)),
            out_shape=jax.ShapeDtypeStruct((4, NC * CHUNK), jnp.float32),
        )(pts)

    if case in ("copy", "copy+meta", "copy+any"):
        return pl.pallas_call(
            k, grid=(NC,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 16, 2, CHUNK), lambda c: (c, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NC, 16, 2, CHUNK), jnp.float32),
        )(*args)


def main():
    for case in ["small-out", "copy", "copy+meta", "copy+any", "copy+scratch"]:
        fn = jax.jit(functools.partial(run, case))
        t = timeit(fn, n=3)
        print(f"{case:14s}: {t*1e3:8.1f} ms  ({t/NC*1e6:6.2f} us/step)")


if __name__ == "__main__":
    main()
