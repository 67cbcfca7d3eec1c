"""Profile the train-step components on the real chip (round-2 kernel work).

Measures, at the default 16K x (128 fg + 128 bg) workload:
  - fg occupancy-DDA sampler alone
  - hash_encode forward alone (4.2M points)
  - forward render (encode+MLP+integrate)
  - full train step (current stochastic-corner path)
  - lax.sort of 4.2M keyed tuples (morton sort cost for the pipeline)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    # force host fetch (axon tunnel)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
    return (time.perf_counter() - t0) / n


def main():
    from scanerf_tpu.data.synthetic import make_sphere_dataset
    from scanerf_tpu.models import field as field_lib
    from scanerf_tpu.ops import sampling
    from scanerf_tpu.ops.hash_encode import hash_encode
    from scanerf_tpu.train import cameras as cam_lib
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.train.tile import TileData, TrainConfig

    n_cameras, H, W = 16, 256, 256
    images, depths, ks, c2ws = make_sphere_dataset(n_cameras, H, W)
    tc = TrainConfig(num_sample=128, num_bg_sample=128, batch_log2=14,
                     total_step=40000, num_march=512)
    params, fstate = field_lib.create_field(
        jax.random.PRNGKey(0),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=21,
        grid_resolution=(32, 2048),
        sampler_log2dim=6,
    )
    state = tile_lib.create_train_state(params, fstate, n_cameras, tc)
    data = TileData(
        images=jnp.asarray(images),
        occlusions=jnp.ones(images.shape[:3], bool),
        cameras=cam_lib.make_cameras(ks, jnp.asarray(c2ws)),
        mono_depths=jnp.asarray(depths),
        mono_normals=jnp.zeros((*images.shape[:3], 3)),
    )
    tx = tile_lib.build_optimizer(tc)

    B = 2**14
    key = jax.random.PRNGKey(1)
    rays_o = jnp.zeros((B, 3)) + jnp.array([0.0, 0.0, 3.0])
    d = jax.random.normal(key, (B, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # 1. sampler alone
    @jax.jit
    def run_sampler(ro, rd):
        return sampling.sample_points_grid(
            ro, rd, tc.num_sample, fstate.occupied_grid,
            field_lib.inner_corner(fstate), field_lib.inner_size(fstate),
            num_march=tc.num_march)

    t = timeit(run_sampler, rays_o, rays_d)
    print(f"fg sampler (16K rays, 512 march): {t*1e3:.1f} ms")

    # 2. hash_encode forward alone, 4.2M points
    N = B * tc.num_sample * 2
    pts = jax.random.uniform(key, (N, 3), minval=-2.0, maxval=2.0)

    @jax.jit
    def run_encode(p, feats):
        return hash_encode(p, feats, fstate.resolutions)

    t = timeit(run_encode, pts, params.features)
    print(f"hash_encode fwd ({N/1e6:.1f}M pts): {t*1e3:.1f} ms")

    # 2b. encode fwd+bwd (exact XLA scatter)
    @jax.jit
    def run_encode_grad(p, feats):
        def loss(f):
            return jnp.sum(hash_encode(p, f, fstate.resolutions) ** 2)
        return jax.grad(loss)(feats)

    t = timeit(run_encode_grad, pts, params.features, n=2, warmup=1)
    print(f"hash_encode fwd+bwd exact XLA ({N/1e6:.1f}M pts): {t*1e3:.1f} ms")

    # 3. forward render (fg+bg)
    @jax.jit
    def run_render(p, ro, rd):
        return field_lib.render_rays(
            p, fstate, ro, rd, tc.num_sample, tc.num_bg_sample,
            jnp.asarray(0), train=True, num_march=tc.num_march)

    t = timeit(run_render, params, rays_o, rays_d)
    print(f"forward render (fg+bg): {t*1e3:.1f} ms")

    # 4. full train step (current path)
    def run_step(s, k):
        return tile_lib.train_step(s, data, k, tc, tx)

    t = timeit(run_step, state, key, n=3, warmup=2)
    print(f"full train step (stoch path): {t*1e3:.1f} ms "
          f"-> {B/t:.0f} rays/s")

    # 5. sort cost: 4.2M (u32 key, 3xf32+i32 payload)
    Np = B * tc.num_sample * 2
    keys32 = jax.random.randint(key, (Np,), 0, 2**15).astype(jnp.uint32)
    payload = jax.random.normal(key, (Np, 3))
    pid = jnp.arange(Np, dtype=jnp.int32)

    @jax.jit
    def run_sort(k, p, i):
        return jax.lax.sort((k, p[:, 0], p[:, 1], p[:, 2], i), num_keys=1)

    t = timeit(run_sort, keys32, payload, pid)
    print(f"lax.sort {Np/1e6:.1f}M x (u32 + 4 payloads): {t*1e3:.1f} ms")

    # 6. searchsorted for 2^15 boundaries
    sk = jnp.sort(keys32)

    @jax.jit
    def run_ss(s):
        return jnp.searchsorted(s, jnp.arange(2**15, dtype=jnp.uint32))

    t = timeit(run_ss, sk)
    print(f"searchsorted 2^15 boundaries: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
