"""Probe: lax.sort cost vs payload width + permutation-gather rate.

Resolves the round-3c sort-tax question (PERF.md): is the 4.2M-row
`lax.sort` cost the bitonic BASE (payload width irrelevant -> only a
smaller sort problem helps) or payload traffic (narrow sorts + a row
gather could replace the wide-payload sorts)? Also measures the TRUE
take()-gather rate post timing-methodology fix (the round-2 "12M
rows/s" number came from tunnel-corrupted fetches).

Run on the real chip: python scripts/probe_sort_width.py
"""

import os
import time

import jax

# honor an explicit JAX_PLATFORMS request (the axon plugin ignores the
# env var and hangs init when its tunnel is down) — enables CPU smokes
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"].lower())

import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    N = 2**14 * 256  # the training stream size
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (N,), 0, 2**22, dtype=jnp.int32)
    perm = jax.random.permutation(jax.random.PRNGKey(1), N)

    for width in (1, 2, 8, 32):
        cols = [jax.random.normal(jax.random.PRNGKey(10 + i), (N,))
                for i in range(width)]

        def run(k, *cs):
            out = jax.lax.sort((k,) + cs, num_keys=1)
            return out[1]

        t = timeit(jax.jit(run), keys, *cols)
        print(f"lax.sort {N/1e6:.1f}M rows, {width:2d} payload cols: "
              f"{t*1e3:7.1f} ms", flush=True)

    for width in (1, 8, 32):
        mat = jax.random.normal(jax.random.PRNGKey(2), (N, width))
        t = timeit(jax.jit(lambda m, p: jnp.take(m, p, axis=0)), mat, perm)
        rate = N / t / 1e6
        print(f"take-gather {N/1e6:.1f}M rows x {width:2d} cols: "
              f"{t*1e3:7.1f} ms ({rate:.0f}M rows/s, "
              f"{N*width*4/t/1e9:.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
