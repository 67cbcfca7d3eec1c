"""Round-3 profile part 2: backward kernel, decoder, unsort, HBM probe.

Uses vjp with a precomputed cotangent so the backward kernel is measured
alone (the naive grad-of-sum graph OOMs the remote compile helper).
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
    from scanerf_tpu.ops.pallas import hash_encode as hw

    H = 2**21
    L, F = 16, 2
    N = 2**14 * 256
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    x = jax.random.uniform(k1, (N, 3), minval=-2.0, maxval=2.0)
    dirs = jax.random.normal(k2, (N, 3))
    feats = jax.random.normal(k3, (L, H, F), jnp.float32) * 1e-4
    res = jnp.tile(
        jnp.geomspace(32, 2048, L).astype(jnp.int32)[:, None], (1, 3))
    Np, NC = hw.padded_size(N, H)

    sp = jax.jit(lambda a, b: hw.sort_pack(a, b, H))
    stream = jax.block_until_ready(sp(x, dirs))
    del x, dirs

    # 1. bwd kernel alone (precomputed cotangent)
    g = jax.random.normal(jax.random.PRNGKey(7), (Np, L * F)) * 1e-3

    def make_bwd(bf16):
        return jax.jit(
            lambda s_pts, s_meta, s_vis, f, gg: hw._run_bwd(
                hw.SortedStream(pts=s_pts, meta=s_meta, pidp=None,
                                inv_full=None, visited=s_vis),
                f, res, gg, onehot_bf16=bf16,
            )
        )

    t_b = timeit(make_bwd(False), stream.pts, stream.meta,
                 stream.visited, feats, g, n=3)
    print(f"bwd kernel alone (f32 one-hot): {t_b*1e3:.1f} ms", flush=True)
    t_bb = timeit(make_bwd(True), stream.pts, stream.meta,
                  stream.visited, feats, g, n=3)
    print(f"bwd kernel alone (bf16 one-hot): {t_bb*1e3:.1f} ms",
          flush=True)

    # 2. fwd kernel (repeat for same-session comparability)
    fwd = jax.jit(lambda p, m, v, f: hw.hash_lookup_sorted(p, m, v, f, res))
    t_f = timeit(fwd, stream.pts, stream.meta, stream.visited, feats)
    print(f"fwd kernel: {t_f*1e3:.1f} ms", flush=True)
    fs = jax.block_until_ready(
        fwd(stream.pts, stream.meta, stream.visited, feats))

    # 3. decoder on the sorted stream
    dec = decoder_lib.init_decoder(jax.random.PRNGKey(5), 32)
    dirs_s = stream.pts[:, 4:7, :].transpose(0, 2, 1).reshape(Np, 3)

    def run_dec(f_s, d_s):
        out = decoder_lib.apply_decoder(dec, f_s, d_s, jnp.ones((32,)))
        return jnp.concatenate(
            [out["sigma"], out["diffuse"], out["tint"], out["specular"]], -1)

    decj = jax.jit(run_dec)
    t_d = timeit(decj, fs, dirs_s)
    print(f"decoder sorted ({Np/1e6:.1f}M rows): {t_d*1e3:.1f} ms",
          flush=True)
    cols10 = jax.block_until_ready(decj(fs, dirs_s))

    # 4. decoder fwd+bwd (training path)
    def dec_fb(f_s, d_s):
        y, vjpf = jax.vjp(run_dec, f_s, d_s)
        return vjpf(jnp.ones_like(y))

    dfb = jax.jit(dec_fb)
    t_dfb = timeit(dfb, fs, dirs_s, n=3)
    print(f"decoder fwd+bwd: {t_dfb*1e3:.1f} ms", flush=True)

    # 5. unsort fwd / bwd (10 cols) + sp_bwd-style 7-op sort
    uns = jax.jit(lambda c, p: hw.unsort_rows(c, p, None, N))
    t_u = timeit(uns, cols10, stream.pidp)
    print(f"unsort fwd 10 cols (+inv payload): {t_u*1e3:.1f} ms", flush=True)

    def ub(c, p):
        y, vjpf = jax.vjp(lambda cc: hw.unsort_rows(cc, p, None, N), c)
        return vjpf(y)

    ubj = jax.jit(ub)
    t_ub = timeit(ubj, cols10, stream.pidp, n=3)
    print(f"unsort fwd+bwd 10 cols: {t_ub*1e3:.1f} ms", flush=True)

    # 6. sampler (fg DDA)
    from scanerf_tpu.ops import sampling

    B = 2**14
    occ = jnp.ones((64, 64, 64), bool)
    ro = jnp.zeros((B, 3)) + jnp.array([0.0, 0.0, 3.0])
    d = jax.random.normal(jax.random.PRNGKey(3), (B, 3))
    rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    @jax.jit
    def run_sampler(o, dd):
        return sampling.sample_points_grid(
            o, dd, 128, occ, jnp.array([-1.0, -1.0, -1.0]),
            jnp.array([2.0, 2.0, 2.0]), num_march=512)

    t_s = timeit(run_sampler, ro, rd)
    print(f"fg sampler 16K rays x 512 march: {t_s*1e3:.1f} ms", flush=True)

    # 0. HBM stream probe (clean): copy-scale a 256 MiB array in-jit
    big = jax.random.normal(k1, (64, 1024, 1024))

    @jax.jit
    def stream_op(a):
        return a * 1.0001 + 0.5

    t = timeit(stream_op, big)
    gbs = 2 * big.size * 4 / t / 1e9
    print(f"HBM stream (1 GiB rw): {t*1e3:.1f} ms -> {gbs:.0f} GB/s",
          flush=True)

    print("---- summary (same session) ----", flush=True)
    print(f"fwd {t_f*1e3:.0f} | bwd {t_b*1e3:.0f} | dec {t_d*1e3:.0f} "
          f"| dec f+b {t_dfb*1e3:.0f} | unsort f+b {t_ub*1e3:.0f} "
          f"| sampler {t_s*1e3:.0f}", flush=True)


if __name__ == "__main__":
    main()
