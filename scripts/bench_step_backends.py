"""Full train-step benchmark: xla(stochastic) vs windowed backends.

Median of n steps at the reference default workload (16K rays x 128+128).
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def med_steps(state, data, tc, tx, n=5):
    from scanerf_tpu.train import tile as tile_lib

    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, aux = tile_lib.train_step(state, data, sub, tc, tx)
    _ = float(aux["total_loss"])
    ts = []
    for _ in range(n):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, aux = tile_lib.train_step(state, data, sub, tc, tx)
        _ = float(aux["total_loss"])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(aux["total_loss"])


def main():
    from scanerf_tpu.data.synthetic import make_sphere_dataset
    from scanerf_tpu.models import field as field_lib
    from scanerf_tpu.train import cameras as cam_lib
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.train.tile import TileData, TrainConfig

    n_cameras, H, W = 16, 256, 256
    images, depths, ks, c2ws = make_sphere_dataset(n_cameras, H, W)
    base = TrainConfig(
        num_sample=128, num_bg_sample=128, batch_log2=14,
        total_step=40000, num_march=512,
    )
    params, fstate = field_lib.create_field(
        jax.random.PRNGKey(0),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=21,
        grid_resolution=(32, 2048),
        sampler_log2dim=6,
    )
    data = TileData(
        images=jnp.asarray(images),
        occlusions=jnp.ones(images.shape[:3], bool),
        cameras=cam_lib.make_cameras(ks, jnp.asarray(c2ws)),
        mono_depths=jnp.asarray(depths),
        mono_normals=jnp.zeros((*images.shape[:3], 3)),
    )
    B = 2**base.batch_log2 // n_cameras // 4 * 4 * n_cameras

    for backend, stoch in (("windowed", False), ("xla", True)):
        tc = dataclasses.replace(
            base, hash_backend=backend, stochastic_hash_grad=stoch)
        # train_step donates the state, which aliases params/fstate —
        # hand each arm copies so the masters survive the previous arm
        cp = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))
        state = tile_lib.create_train_state(
            cp(params), cp(fstate), n_cameras, tc)
        tx = tile_lib.build_optimizer(tc)
        t, loss = med_steps(state, data, tc, tx)
        print(f"{backend:9s}: {t*1e3:8.1f} ms/step  -> {B/t:8.0f} rays/s "
              f"(loss {loss:.4f})")


if __name__ == "__main__":
    main()
