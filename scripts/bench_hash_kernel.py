"""Benchmark the windowed Pallas hash kernel on the real chip.

Production shape: N = 2^14 rays x (128 fg + 128 bg) = 4.2M points per
step (fg+bg merged), L=16 levels, H=2^21, F=2.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.ops.pallas import hash_encode as hw


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    N = int(__import__("os").environ.get("BENCH_N", 2**14 * 256))
    L, H = 16, 2**21
    key = jax.random.PRNGKey(0)
    kp, kf, kt = jax.random.split(key, 3)
    # mix: half clustered (fg surfaces), half uniform (bg shell)
    uni = jax.random.uniform(kp, (N // 2, 3), minval=-2.0, maxval=2.0)
    clu = jnp.clip(0.3 * jax.random.normal(kf, (N // 2, 3)), -1.9, 1.9)
    pts = jnp.concatenate([uni, clu], axis=0)
    dirs = jax.random.normal(kt, (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    feats = 0.01 * jax.random.normal(kf, (L, H, 2), jnp.float32)
    res = jnp.asarray(np.stack(
        [(np.array([32, 32, 32]) * (2048 / 32) ** (i / 15)).astype(np.int32)
         for i in range(L)]))

    # --- stage timings ---
    sp = jax.jit(functools.partial(hw.sort_pack, H=H))
    t = timeit(sp, pts, dirs)
    print(f"sort_pack ({N/1e6:.1f}M pts):        {t*1e3:8.1f} ms")

    stream = sp(pts, dirs)
    stream = jax.tree_util.tree_map(jnp.asarray, stream)
    span = np.asarray(stream.meta[:, 0, 2])
    print(f"  span: mean {span.mean():.2f} max {span.max()}  "
          f"NC {stream.pts.shape[0]}")

    lk = jax.jit(hw.hash_lookup_sorted)
    t = timeit(lk, stream.pts, stream.meta, stream.visited, feats, res)
    print(f"lookup fwd kernel:            {t*1e3:8.1f} ms")

    feats_s = lk(stream.pts, stream.meta, stream.visited, feats, res)
    Np = feats_s.shape[0]
    tang_s = 0.01 * jax.random.normal(kt, (Np, L * 2))

    @jax.jit
    def bwd(p, m, v, f, g):
        def loss(pp, ff):
            return jnp.sum(hw.hash_lookup_sorted(pp, m, v, ff, res) * g)
        return jax.grad(loss, argnums=(0, 1))(p, f)

    t = timeit(bwd, stream.pts, stream.meta, stream.visited, feats, tang_s)
    print(f"lookup fwd+bwd kernels:       {t*1e3:8.1f} ms")

    un = jax.jit(functools.partial(hw.unsort_rows, N=N))
    vals = jax.random.normal(kt, (Np, 10))
    t = timeit(un, vals, stream.pidp, stream.inv_full)
    print(f"unsort_rows 10 cols:          {t*1e3:8.1f} ms")

    # --- end-to-end drop-in fwd+bwd (what a train step pays) ---
    tang = 0.01 * jax.random.normal(kt, (N, L * 2))

    @jax.jit
    def fwdbwd(p, f, g):
        def loss(pp, ff):
            return jnp.sum(hw.hash_encode_windowed(pp, ff, res) * g)
        return jax.grad(loss, argnums=(0, 1))(p, f)

    t = timeit(fwdbwd, pts, feats, tang)
    print(f"drop-in fwd+bwd (32-col unsort): {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
