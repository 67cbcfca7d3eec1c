"""Probe: many-small-descriptor DMA throughput (HBM -> VMEM).

Decides the round-4 run-length-sort question (PERF.md "Round-3c
sort-tax analysis"): expanding ~100K sorted runs back into a packed
4.2M-point stream needs ~25 contiguous-block DMAs per 1024-row chunk.
If issuing K row-range descriptors per chunk costs much more than one
big one, the redesign loses to the ~60 ms bitonic sorts it replaces.

Measures, for K in {1, 8, 32}: a kernel whose grid is NC=4096 chunks,
each DMA-ing K contiguous [1024/K, 16]-row f32 slices from random
offsets of a [4.2M, 16] HBM source into VMEM, then writing their sum
(forces the data). Reports ms per variant and the per-descriptor
overhead implied by the K=32 vs K=1 delta.

Run on the real chip: python scripts/probe_dma_runs.py
"""

import functools
import os
import time

import jax

# honor an explicit JAX_PLATFORMS request (the axon plugin ignores the
# env var and hangs init when its tunnel is down) — enables CPU smokes
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"].lower())

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024
D = 16


def _kernel(off_ref, src_hbm, out_ref, scratch, sem, *, K,
            overlap=False):
    rows = CHUNK // K
    if overlap:
        # issue every descriptor, then drain — what a real run-length
        # expansion kernel would do (per-descriptor LATENCY hides; the
        # serial variant below measures it exposed, the worst case)
        dmas = []
        for k in range(K):
            start = off_ref[0, 0, k]
            dma = pltpu.make_async_copy(
                src_hbm.at[pl.ds(start, rows), :],
                scratch.at[pl.ds(k * rows, rows), :],
                sem.at[k],
            )
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()
    else:
        for k in range(K):
            start = off_ref[0, 0, k]
            dma = pltpu.make_async_copy(
                src_hbm.at[pl.ds(start, rows), :],
                scratch.at[pl.ds(k * rows, rows), :],
                sem.at[k],
            )
            dma.start()
            dma.wait()
    acc = jnp.sum(scratch[...], axis=0, keepdims=True)
    out_ref[0:1, :] = acc


def build(K, NC, N, overlap=False):
    rng = np.random.RandomState(K)
    rows = CHUNK // K
    offs = rng.randint(0, N - rows, size=(NC, 1, K)).astype(np.int32)
    # Mosaic requires the last two block dims be (8k, 128k) or equal to
    # the array dims — replicate offsets over an 8-sublane axis so the
    # (1, 8, K) block is legal in SMEM.
    offs = np.repeat(offs, 8, axis=1)

    f = pl.pallas_call(
        functools.partial(_kernel, K=K, overlap=overlap),
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, 8, K), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, D), lambda c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((NC, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, D), jnp.float32),
            pltpu.SemaphoreType.DMA((K,)),
        ],
        interpret=jax.default_backend() == "cpu",
    )
    return f, jnp.asarray(offs)


def main():
    # env knobs so a CPU interpret-mode smoke can shrink the workload
    # (PROBE_LOGN=12 PROBE_NC=4 validates shapes without the chip)
    N = 2 ** int(os.environ.get("PROBE_LOGN", 22))
    NC = int(os.environ.get("PROBE_NC", 4096))
    src = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    results = {}
    for overlap in (False, True):
        tag = "overlap" if overlap else "serial "
        for K in (1, 8, 32):
            f, offs = build(K, NC, N, overlap=overlap)
            run = jax.jit(lambda o, s, f=f: f(o, s))
            out = run(offs, src)
            _ = float(jnp.ravel(out)[0])
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = run(offs, src)
                _ = float(jnp.ravel(out)[0])
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            results[(overlap, K)] = dt
            print(f"{tag} K={K:3d} descriptors/chunk: {dt*1e3:7.1f} ms "
                  f"({NC*K/dt/1e6:.2f}M descriptors/s)", flush=True)
        per_desc = (results[(overlap, 32)] - results[(overlap, 1)]) / (
            NC * (32 - 1))
        print(f"{tag} per-descriptor overhead ~{per_desc*1e9:.0f} ns -> "
              f"100K-run expansion ~{per_desc*1e5*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
