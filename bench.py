"""Benchmark: single-tile training throughput in rays/sec on one chip.

Workload mirrors the reference default (``config/default.yaml``): 2^14 rays
per step, 128 fg + 128 bg samples per ray, 16x2 hash features. The hash
table is 2^21 per level here (fits one chip with Adam moments alongside the
other state; the reference default 2^24 is a multi-chip configuration).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 5e6 (the 5M rays/sec v4-8 north-star from
BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from scanerf_tpu.data.synthetic import make_sphere_dataset
    from scanerf_tpu.models import field as field_lib
    from scanerf_tpu.train import cameras as cam_lib
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.train.tile import TileData, TrainConfig

    n_cameras, H, W = 16, 256, 256
    images, depths, ks, c2ws = make_sphere_dataset(n_cameras, H, W)
    tc = TrainConfig(
        num_sample=128,
        num_bg_sample=128,
        batch_log2=14,
        total_step=40000,
        num_march=512,
        # the sorted-stream Pallas kernel path (exact gradients); the
        # round-1 number (2322 rays/s) was hash_backend="xla" with the
        # stochastic-corner estimator
        hash_backend="windowed",
        stochastic_hash_grad=False,
    )
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

    key = jax.random.PRNGKey(0)
    rays_per_step = (2**tc.batch_log2 // n_cameras) // 4 * 4 * n_cameras

    # warmup + compile; NOTE: on the axon tunnel block_until_ready can
    # return before remote execution completes — force host fetches
    for i in range(3):
        key, sub = jax.random.split(key)
        state, aux = tile_lib.train_step(state, data, sub, tc, tx)
    _ = float(aux["total_loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, aux = tile_lib.train_step(state, data, sub, tc, tx)
    _ = float(aux["total_loss"])  # forces the whole dependency chain
    dt = time.perf_counter() - t0

    rays_per_sec = rays_per_step * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "training_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / 5e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
