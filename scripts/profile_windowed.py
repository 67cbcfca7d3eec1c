"""Piecewise profile of the windowed sorted-stream pipeline (round 3).

Measures each stage of the production train-step path on the real chip
at the default 16K x (128 fg + 128 bg) workload (N = 4.2M points),
plus lax.sort operand-count calibration for the Pallas-sort design.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _probe(out):
    """Force one SCALAR host fetch (block_until_ready can return early on
    the axon tunnel; fetching the whole output would time the tunnel)."""
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
    from scanerf_tpu.ops.pallas import hash_encode as hw

    H = 2**21
    L, F = 16, 2
    N = 2**14 * 256  # 4.2M
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (N, 3), minval=-2.0, maxval=2.0)
    dirs = jax.random.normal(k2, (N, 3))
    feats = jax.random.normal(k3, (L, H, F), jnp.float32) * 1e-4
    res = jnp.tile(
        jnp.geomspace(32, 2048, L).astype(jnp.int32)[:, None], (1, 3))

    Np, NC = hw.padded_size(N, H)
    print(f"N={N} Np={Np} NC={NC} H=2^21", flush=True)

    # 1. sort_pack forward (and without the inverse-permutation sort)
    sp = jax.jit(lambda a, b: hw.sort_pack(a, b, H))
    t_sp = timeit(sp, x, dirs)
    print(f"sort_pack fwd: {t_sp*1e3:.1f} ms", flush=True)
    spni = jax.jit(
        lambda a, b: hw._sort_pack_impl(a, b, H, need_inverse=False).pts
    )
    t_spn = timeit(spni, x, dirs)
    print(f"sort_pack fwd (no inverse sort): {t_spn*1e3:.1f} ms",
          flush=True)
    stream = jax.block_until_ready(sp(x, dirs))

    # 1b. components of sort_pack: the main 8-op sort, the inverse 2-op sort
    wid = jnp.asarray(np.random.randint(0, H // 512, N), jnp.int32)
    cols = [jax.random.normal(jax.random.PRNGKey(i), (N,)) for i in range(7)]

    def run_sort_k(k, rows=None):
        ops = (wid,) + tuple(cols[:k])
        if rows is not None:
            ops = tuple(o[:rows] for o in ops)
        f = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1))
        return timeit(f, *ops)

    for k in (0, 1, 3, 7):
        t = run_sort_k(k)
        print(f"lax.sort 1 key + {k} payloads @{N/1e6:.1f}M: {t*1e3:.1f} ms",
              flush=True)
    for rows in (N // 2, N // 4):
        t = run_sort_k(1, rows)
        print(f"lax.sort 1 key + 1 payload @{rows/1e6:.1f}M: "
              f"{t*1e3:.1f} ms", flush=True)

    # 2. fwd kernel alone
    fwd = jax.jit(lambda p, m, v, f: hw.hash_lookup_sorted(p, m, v, f, res))
    t_f = timeit(fwd, stream.pts, stream.meta, stream.visited, feats)
    print(f"hash_lookup_sorted fwd: {t_f*1e3:.1f} ms", flush=True)

    # 3. fwd+bwd kernel
    def fb(p, m, v, f):
        def loss(f_):
            return jnp.sum(hw.hash_lookup_sorted(p, m, v, f_, res) ** 2)
        return jax.grad(loss)(f)

    fbj = jax.jit(fb)
    t_fb = timeit(fbj, stream.pts, stream.meta, stream.visited, feats,
                  n=3, warmup=2)
    print(f"hash_lookup_sorted fwd+bwd: {t_fb*1e3:.1f} ms "
          f"(bwd ~{(t_fb-t_f)*1e3:.1f} ms)", flush=True)

    # 4. decoder on sorted stream (chunked matmuls)
    dec = decoder_lib.init_decoder(jax.random.PRNGKey(5), 32)
    fs = jax.block_until_ready(
        fwd(stream.pts, stream.meta, stream.visited, feats))
    dirs_s = stream.pts[:, 4:7, :].transpose(0, 2, 1).reshape(Np, 3)

    def run_dec(f_s, d_s):
        out = decoder_lib.apply_decoder(dec, f_s, d_s, jnp.ones((32,)))
        return jnp.concatenate(
            [out["sigma"], out["diffuse"], out["tint"], out["specular"]], -1)

    decj = jax.jit(run_dec)
    t_d = timeit(decj, fs, dirs_s)
    print(f"decoder sorted stream ({Np/1e6:.1f}M rows): {t_d*1e3:.1f} ms",
          flush=True)
    cols10 = jax.block_until_ready(decj(fs, dirs_s))

    # 5. unsort fwd (10 cols) and bwd
    uns = jax.jit(lambda c, p, i: hw.unsort_rows(c, p, i, N))
    t_u = timeit(uns, cols10, stream.pidp, stream.inv_full)
    print(f"unsort_rows fwd 10 cols: {t_u*1e3:.1f} ms", flush=True)

    def ub(c, p, i):
        return jax.grad(
            lambda c_: jnp.sum(hw.unsort_rows(c_, p, i, N)))(c)

    ubj = jax.jit(ub)
    t_ub = timeit(ubj, cols10, stream.pidp, stream.inv_full)
    print(f"unsort_rows bwd 10 cols: {t_ub*1e3:.1f} ms", flush=True)

    # 6. sp_bwd sort (7-op)
    print("---- summary ----", flush=True)
    print(f"sort_pack {t_sp*1e3:.0f} | fwd {t_f*1e3:.0f} | "
          f"bwd {(t_fb-t_f)*1e3:.0f} | dec {t_d*1e3:.0f} | "
          f"unsort f+b {(t_u+t_ub)*1e3:.0f}", flush=True)


if __name__ == "__main__":
    main()
