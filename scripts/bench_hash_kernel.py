"""Benchmark the windowed Pallas hash kernel on the real chip.

Production shape: N = 2^14 rays x 128 samples = 2.1M points per pass,
L=16 levels, H=2^21, F=2. Compares against the round-1 XLA paths.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.ops.pallas import hash_encode as hw


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n


def main():
    N = 2**14 * 128
    L, H = 16, 2**21
    key = jax.random.PRNGKey(0)
    kp, kf, kt = jax.random.split(key, 3)
    # mix: half clustered (fg surface-ish), half uniform (bg)
    uni = jax.random.uniform(kp, (N // 2, 3), minval=-2.0, maxval=2.0)
    clu = jnp.clip(0.3 * jax.random.normal(kf, (N // 2, 3)), -1.9, 1.9)
    pts = jnp.concatenate([uni, clu], axis=0)
    feats = 0.01 * jax.random.normal(kf, (L, H, 2), jnp.float32)
    res = jnp.asarray(
        hw.np.stack(
            [
                (np.array([32, 32, 32]) * (2048 / 32) ** (i / 15)).astype(
                    np.int32
                )
                for i in range(L)
            ]
        )
    )
    tang = 0.01 * jax.random.normal(kt, (N, L * 2))

    fwd = jax.jit(hw.hash_encode_windowed)
    t = timeit(fwd, pts, feats, res, n=3, warmup=2)
    print(f"windowed fwd  ({N/1e6:.1f}M pts, H=2^21, L=16): {t*1e3:8.1f} ms")

    @jax.jit
    def fwdbwd(p, f, t):
        def loss(pp, ff):
            return jnp.sum(hw.hash_encode_windowed(pp, ff, res) * t)
        return jax.grad(loss, argnums=(0, 1))(p, f)

    t2 = timeit(fwdbwd, pts, feats, tang, n=3, warmup=2)
    print(f"windowed fwd+bwd: {t2*1e3:8.1f} ms")

    # component timings of the host-side prep
    @jax.jit
    def prep_only(p):
        return hw._prepare_stream(p, H)

    t3 = timeit(prep_only, pts, n=3, warmup=2)
    print(f"  prep (sort+pad+meta): {t3*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
