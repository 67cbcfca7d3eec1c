"""Probe: Pallas features needed by the windowed hash kernel.

Checks, on whatever backend is active (TPU via axon, or CPU with
interpret=True):
  1. manual DMA from an ANY/HBM-resident input into VMEM scratch,
  2. dynamic-trip-count fori_loop driven by SMEM scalar inputs,
  3. manual DMA write of VMEM scratch to an ANY-resident output,
  4. SMEM-blocked input (per-grid-step scalar rows),
  5. dot_general contractions of the shapes the kernel uses,
  6. (optional) one-vreg dynamic_gather lowering of jnp.take.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

CAP = 256
NB = 4


def kernel(starts_ref, x_hbm, out_hbm, stage, ostage, sem_in, sem_out):
    b = pl.program_id(0)
    qstart = starts_ref[0, 0, 0]
    qend = starts_ref[0, 0, 1]

    nseg = (qend - qstart + CAP - 1) // CAP

    def seg_body(seg, _):
        seg_start = qstart + seg * CAP
        # feature-major layout [3, N]: DMA last dim is the 128-aligned
        # point axis (lane-dim slices must be 128-aligned on TPU)
        dma = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(seg_start, CAP)], stage, sem_in
        )
        dma.start()
        dma.wait()
        count = jnp.minimum(qend - seg_start, CAP)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, CAP), 1)
        mask = (lane < count).astype(jnp.float32)
        ostage[:, :] = stage[:, :] * 2.0 * mask + jnp.float32(b)
        odma = pltpu.make_async_copy(
            ostage, out_hbm.at[:, pl.ds(seg_start, CAP)], sem_out
        )
        odma.start()
        odma.wait()
        return ()

    jax.lax.fori_loop(0, nseg, seg_body, ())


def run():
    N = 1000
    x = jnp.arange(N * 8, dtype=jnp.float32).reshape(8, N)
    npad = N + CAP
    xp = jnp.pad(x, ((0, 0), (0, CAP)))
    # block b owns rows [250b, 250(b+1)); SMEM blocks need the
    # second-to-last dim divisible by 8, so rows are padded to (NB, 8, 2)
    starts = jnp.array(
        [[0, 250], [250, 500], [500, 750], [750, 1000]], jnp.int32
    )
    starts = jnp.broadcast_to(starts[:, None, :], (NB, 8, 2))

    out = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, 2), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, CAP), jnp.float32),
            pltpu.VMEM((8, CAP), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=INTERPRET,
    )(starts, xp)
    out = np.asarray(out[:, :N])
    expect = np.asarray(x) * 2.0 + np.repeat(np.arange(4), 250)[None, :]
    ok = np.allclose(out, expect)
    print("probe1 manual-DMA + dyn fori + SMEM block:", "OK" if ok else "FAIL")
    if not ok:
        print(out[:4], expect[:4], out[248:252], expect[248:252])

    # --- probe 2: dot_general shapes ([2,64]@[64,128], NT contraction) ---
    def k2(a_ref, b_ref, g_ref, o1_ref, o2_ref):
        o1_ref[:, :] = jax.lax.dot_general(
            a_ref[:, :], b_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o2_ref[:, :] = jax.lax.dot_general(
            g_ref[:, :], b_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    a = jnp.ones((2, 64)) * 0.5
    bm = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128) / 1e3
    g = jnp.ones((2, 128))
    o1, o2 = pl.pallas_call(
        k2,
        out_shape=(
            jax.ShapeDtypeStruct((2, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, 64), jnp.float32),
        ),
        interpret=INTERPRET,
    )(a, bm, g)
    ok1 = np.allclose(np.asarray(o1), np.asarray(a @ bm), rtol=1e-5)
    ok2 = np.allclose(np.asarray(o2), np.asarray(g @ bm.T), rtol=1e-5)
    print("probe2 dot_general NN/NT:", "OK" if (ok1 and ok2) else "FAIL")

    # --- probe 3: one-vreg LUT gather (optional fast path) ---
    def k3(tab_ref, idx_ref, o_ref):
        o_ref[:, :] = jnp.take(
            tab_ref[0, :], idx_ref[:, :], axis=0, fill_value=0.0
        )

    tab = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)
    idx = jnp.mod(
        jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 37, 128
    )
    try:
        o3 = pl.pallas_call(
            k3,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=INTERPRET,
        )(tab, idx)
        ok3 = np.allclose(np.asarray(o3), np.asarray(tab[0])[np.asarray(idx)])
        print("probe3 one-vreg LUT take:", "OK" if ok3 else "WRONG-RESULT")
    except Exception as e:  # noqa: BLE001
        print("probe3 one-vreg LUT take: UNSUPPORTED:", str(e)[:200])


if __name__ == "__main__":
    run()
