"""Probes for the chunk-grid windowed hash kernel design.

P1: take_along_axis one-vreg LUT gather ([8,128] axis=1)
P2: dynamic lane-slice VMEM read at 64-multiple offsets
P3: PrefetchScalarGridSpec: scalar-indexed input AND accumulated output
    blocks with repeated (monotone) indices + first-visit zeroing
P4: dot_general [2,1024] NT [64,1024] -> [2,64] (batched-corner scatter)
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


def probe(name, fn):
    try:
        ok = fn()
        print(f"{name}:", "OK" if ok else "WRONG-RESULT")
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:220]
        print(f"{name}: FAIL {msg}")


def p1():
    def k(win_ref, idx_ref, o_ref):
        win = jnp.broadcast_to(win_ref[0:1, :], (8, 128))
        o_ref[:, :] = jnp.take_along_axis(win, idx_ref[:, :], axis=1)

    win = (jnp.arange(128, dtype=jnp.float32) * 3.0).reshape(1, 128)
    idx = jnp.mod(jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 37, 128)
    o = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=INTERPRET,
    )(win, idx)
    return np.allclose(np.asarray(o), np.asarray(win[0])[np.asarray(idx)])


def p2():
    def k(slab_ref, w_ref, o_ref):
        w = w_ref[0]
        o_ref[:, :] = slab_ref[:, pl.ds(w * 64, 64)]

    slab = jnp.arange(8 * 4096, dtype=jnp.float32).reshape(8, 4096)
    w = jnp.array([13], jnp.int32)
    o = pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((8, 64), jnp.float32),
        interpret=INTERPRET,
    )(slab, w)
    return np.allclose(np.asarray(o), np.asarray(slab[:, 13 * 64 : 14 * 64]))


def p3():
    # 8 chunks -> 3 slabs (block_of_chunk = [0,0,0,1,1,1,3,3]): input slab
    # selected by prefetched scalar; output accumulator indexed the same,
    # zeroed on first visit; slab 2 never visited.
    NC, NSLAB = 8, 4
    boc = jnp.array([0, 0, 0, 1, 1, 1, 3, 3], jnp.int32)
    first = jnp.array([1, 0, 0, 1, 0, 0, 1, 0], jnp.int32)
    x = jnp.arange(NC * 8 * 128, dtype=jnp.float32).reshape(NC * 8, 128)
    slabs = jnp.arange(NSLAB * 8 * 128, dtype=jnp.float32).reshape(NSLAB * 8, 128)

    def k(boc_ref, first_ref, x_ref, slab_ref, acc_ref):
        c = pl.program_id(0)

        @pl.when(first_ref[c] == 1)
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref)

        acc_ref[:, :] += x_ref[:, :] + slab_ref[:, :] * 0.001

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda c, boc, first: (c, 0)),
            pl.BlockSpec((8, 128), lambda c, boc, first: (boc[c], 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda c, boc, first: (boc[c], 0)),
    )
    acc = pl.pallas_call(
        k, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NSLAB * 8, 128), jnp.float32),
        interpret=INTERPRET,
    )(boc, first, x, slabs)
    acc = np.asarray(acc).reshape(NSLAB, 8, 128)
    xs = np.asarray(x).reshape(NC, 8, 128)
    sl = np.asarray(slabs).reshape(NSLAB, 8, 128)
    exp0 = xs[0] + xs[1] + xs[2] + 3 * 0.001 * sl[0]
    exp1 = xs[3] + xs[4] + xs[5] + 3 * 0.001 * sl[1]
    exp3 = xs[6] + xs[7] + 2 * 0.001 * sl[3]
    return (
        np.allclose(acc[0], exp0)
        and np.allclose(acc[1], exp1)
        and np.allclose(acc[3], exp3)
    )


def p4():
    def k(g_ref, oh_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            g_ref[:, :], oh_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    g = jnp.arange(2 * 1024, dtype=jnp.float32).reshape(2, 1024) / 100.0
    oh = (jnp.arange(64 * 1024).reshape(64, 1024) % 7 == 0).astype(jnp.float32)
    o = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((2, 64), jnp.float32),
        interpret=INTERPRET,
    )(g, oh)
    return np.allclose(np.asarray(o), np.asarray(g) @ np.asarray(oh).T)


if __name__ == "__main__":
    probe("P1 take_along_axis LUT", p1)
    probe("P2 dyn lane-slice @64", p2)
    probe("P3 prefetch-indexed accum", p3)
    probe("P4 dot [2,1024]x[64,1024]T", p4)
