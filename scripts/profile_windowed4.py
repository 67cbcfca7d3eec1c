"""Round-3c piecewise profile of the FUSED training pipeline (fused
Pallas CDF sampler + fused hash+ShallowMLP kernel + 8-col unsort), the
configuration bench.py now measures. Companion to profile_windowed3.py
(the unfused pieces); both use device-slice probes, never full fetches
(PERF.md "Round-3 measurement correction").

No standalone backward jit of the big kernels — that reliably wedges
the remote compiler (axon notes); the fused bwd cost is inferred by
subtraction from the full rgb step, which IS measured here.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _probe(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _probe(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _probe(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from scanerf_tpu.models import decoder as decoder_lib
    from scanerf_tpu.ops import sampling
    from scanerf_tpu.ops.pallas import fused_train as ft
    from scanerf_tpu.ops.pallas import hash_encode as hw

    H = 2**21
    L, F = 16, 2
    N = 2**14 * 256
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (N, 3), minval=-2.0, maxval=2.0)
    dirs = jax.random.normal(k2, (N, 3))
    feats = jax.random.normal(
        k3, (L, H * F), jnp.float32) * 1e-4  # canonical flat layout
    res = jnp.tile(
        jnp.geomspace(32, 2048, L).astype(jnp.int32)[:, None], (1, 3))
    Np, NC = hw.padded_size(N, H)

    # 1. samplers, fused Pallas vs xla (16K x 128 x 512 march)
    B = 2**14
    occ = jnp.ones((64, 64, 64), bool)
    ro = jnp.zeros((B, 3)) + jnp.array([0.0, 0.0, 3.0])
    d = jax.random.normal(jax.random.PRNGKey(3), (B, 3))
    rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    for backend in ("fused", "xla"):
        t_s = timeit(jax.jit(lambda o, dd, be=backend: sampling.sample_points_grid(
            o, dd, 128, occ, jnp.array([-1.0, -1.0, -1.0]),
            jnp.array([2.0, 2.0, 2.0]), num_march=512, backend=be)), ro, rd)
        print(f"fg sampler [{backend}]: {t_s*1e3:.1f} ms", flush=True)

    # 2. sort_pack fwd / fwd+bwd
    sp = jax.jit(lambda a, b: hw.sort_pack(a, b, H))
    t_sp = timeit(sp, x, dirs)
    print(f"sort_pack fwd: {t_sp*1e3:.1f} ms", flush=True)
    stream = jax.block_until_ready(sp(x, dirs))

    def sp_vjp(a, b, ct_pts):
        _, f_vjp = jax.vjp(lambda aa, bb: hw.sort_pack(aa, bb, H).pts,
                           a, b)
        return f_vjp(ct_pts)

    ct = jax.random.normal(jax.random.PRNGKey(9), stream.pts.shape) * 1e-3
    t_spb = timeit(jax.jit(sp_vjp), x, dirs, ct, n=3)
    print(f"sort_pack fwd+bwd: {t_spb*1e3:.1f} ms "
          f"(bwd ~{(t_spb-t_sp)*1e3:.0f})", flush=True)

    # 3. FUSED fwd kernel (hash lookup + in-kernel ShallowMLP -> 8 cols)
    dec = decoder_lib.init_decoder(jax.random.PRNGKey(5), 32)
    wf = jnp.ones((16,))
    slab = ft.pack_train_slab(dec, wf)

    fusedf = jax.jit(lambda p, m, v, f, s: ft.hash_decode_train(
        p, m, v, f, res, s))
    t_ff = timeit(fusedf, stream.pts, stream.meta, stream.visited, feats,
                  slab)
    print(f"FUSED fwd kernel (hash+MLP, {Np/1e6:.1f}M pts): "
          f"{t_ff*1e3:.1f} ms", flush=True)
    cols8 = jax.block_until_ready(
        fusedf(stream.pts, stream.meta, stream.visited, feats, slab))

    # 4. unsort 8 cols fwd / fwd+bwd
    uns = jax.jit(lambda c, p: hw.unsort_rows(c, p, None, N))
    t_u = timeit(uns, cols8, stream.pidp)
    print(f"unsort fwd 8 cols: {t_u*1e3:.1f} ms", flush=True)

    def ub(c, p):
        y, vjpf = jax.vjp(lambda cc: hw.unsort_rows(cc, p, None, N), c)
        return vjpf(y)

    t_ub = timeit(jax.jit(ub), cols8, stream.pidp, n=3)
    print(f"unsort fwd+bwd 8 cols: {t_ub*1e3:.1f} ms", flush=True)

    # 5. the full rgb step (same workload bench.py measures) for the
    # subtraction baseline
    import bench

    from scanerf_tpu.train import tile as tile_lib

    state, data, tc, tx = bench.build(
        dict(w_warp=0.0, w_depth=0.0, w_smooth=0.0, rho=0.0))
    kk = jax.random.PRNGKey(0)
    for _ in range(3):
        kk, sub = jax.random.split(kk)
        state, aux = tile_lib.train_step(state, data, sub, tc, tx)
    _ = float(aux["total_loss"])
    t0 = time.perf_counter()
    n_steps = 8
    for _ in range(n_steps):
        kk, sub = jax.random.split(kk)
        state, aux = tile_lib.train_step(state, data, sub, tc, tx)
    _ = float(aux["total_loss"])
    t_step = (time.perf_counter() - t0) / n_steps
    print(f"full rgb step: {t_step*1e3:.1f} ms", flush=True)

    known = (t_spb + t_ff + t_ub + 37e-3 + 29e-3)  # + fused sampler + iz
    print("---- summary ----", flush=True)
    print(f"accounted fwd-side (sort f+b {t_spb*1e3:.0f} + fused fwd "
          f"{t_ff*1e3:.0f} + unsort f+b {t_ub*1e3:.0f} + samplers ~66): "
          f"{known*1e3:.0f} ms of {t_step*1e3:.0f} ms -> fused bwd "
          f"kernel + integrate/loss/adam ~{(t_step-known)*1e3:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
