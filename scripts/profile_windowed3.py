"""Round-3 profile part 3: SAFE pieces only (no standalone backward jit
— that reliably wedges the remote compiler; the backward kernel's cost
is inferred by subtraction from the full step).
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
    t_sp = timeit(sp, x, dirs)
    print(f"sort_pack fwd: {t_sp*1e3:.1f} ms", flush=True)
    stream = jax.block_until_ready(sp(x, dirs))

    # sort_pack BACKWARD (pure lax.sort; safe): vjp with a pts cotangent
    def sp_vjp(a, b, ct_pts):
        _, f_vjp = jax.vjp(lambda aa, bb: hw.sort_pack(aa, bb, H).pts,
                           a, b)
        return f_vjp(ct_pts)

    ct = jax.random.normal(jax.random.PRNGKey(9), stream.pts.shape) * 1e-3
    t_spb = timeit(jax.jit(sp_vjp), x, dirs, ct, n=3)
    print(f"sort_pack fwd+bwd: {t_spb*1e3:.1f} ms "
          f"(bwd ~{(t_spb-t_sp)*1e3:.0f})", flush=True)

    fwd = jax.jit(lambda p, m, v, f: hw.hash_lookup_sorted(p, m, v, f, res))
    t_f = timeit(fwd, stream.pts, stream.meta, stream.visited, feats)
    print(f"fwd kernel: {t_f*1e3:.1f} ms", flush=True)
    fs = jax.block_until_ready(
        fwd(stream.pts, stream.meta, stream.visited, feats))

    dec = decoder_lib.init_decoder(jax.random.PRNGKey(5), 32)
    dirs_s = stream.pts[:, 4:7, :].transpose(0, 2, 1).reshape(Np, 3)

    def run_dec(f_s, d_s):
        out = decoder_lib.apply_decoder(dec, f_s, d_s, jnp.ones((32,)))
        return jnp.concatenate(
            [out["sigma"], out["diffuse"], out["tint"], out["specular"]],
            -1)

    decj = jax.jit(run_dec)
    t_d = timeit(decj, fs, dirs_s)
    print(f"decoder fwd ({Np/1e6:.1f}M rows): {t_d*1e3:.1f} ms", flush=True)
    cols10 = jax.block_until_ready(decj(fs, dirs_s))

    def dec_fb(f_s, d_s):
        y, vjpf = jax.vjp(run_dec, f_s, d_s)
        return vjpf(jnp.ones_like(y))

    t_dfb = timeit(jax.jit(dec_fb), fs, dirs_s, n=3)
    print(f"decoder fwd+bwd: {t_dfb*1e3:.1f} ms", flush=True)

    uns = jax.jit(lambda c, p: hw.unsort_rows(c, p, None, N))
    t_u = timeit(uns, cols10, stream.pidp)
    print(f"unsort fwd 10 cols (incl inv payload): {t_u*1e3:.1f} ms",
          flush=True)

    def ub(c, p):
        y, vjpf = jax.vjp(lambda cc: hw.unsort_rows(cc, p, None, N), c)
        return vjpf(y)

    t_ub = timeit(jax.jit(ub), cols10, stream.pidp, n=3)
    print(f"unsort fwd+bwd 10 cols: {t_ub*1e3:.1f} ms", flush=True)

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
    print(f"fg sampler 16K x 512: {t_s*1e3:.1f} ms", flush=True)

    @jax.jit
    def run_iz(o, dd):
        return sampling.inverse_z_sampling(
            o, dd, 128, jnp.zeros(3), jnp.array([2.0, 2.0, 2.0]))

    t_iz = timeit(run_iz, ro, rd)
    print(f"bg iz sampler: {t_iz*1e3:.1f} ms", flush=True)

    known = t_sp + (t_spb - t_sp) + t_f + t_dfb + t_ub + t_s + t_iz
    print("---- summary ----", flush=True)
    print(f"accounted (sort f+b, fwd K, dec f+b, unsort f+b, samplers): "
          f"{known*1e3:.0f} ms of the ~669 ms rgb step -> bwd kernel + "
          f"integrate/loss/adam ~= {669-known*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
