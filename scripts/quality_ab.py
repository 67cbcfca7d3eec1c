"""Quality A/B: windowed hierarchical hash vs the reference global hash.

Trains the same synthetic sphere scene with both backends for N steps and
reports eval PSNR on a held-out view. Validates that the windowed-hash
deviation (corner duplication at window boundaries, slot hash folding)
is PSNR-neutral (PARITY.md).
"""

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _run_arm(backend, over, base, data, eval_cams, images, hold,
             n_cameras, H, W, steps):
    from scanerf_tpu.models import field as field_lib
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.utils.metrics import psnr

    tc = dataclasses.replace(base, **over)
    params, fstate = field_lib.create_field(
        jax.random.PRNGKey(0),
        bbox_corner=np.array([-1.0, -1.0, -1.0]),
        bbox_size=np.array([2.0, 2.0, 2.0]),
        log2_hashmap_size=16,
        grid_resolution=(16, 512),
        sampler_log2dim=5,
    )
    state = tile_lib.create_train_state(params, fstate, hold, tc)
    tx = tile_lib.build_optimizer(tc)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, aux = tile_lib.train_step(state, data, sub, tc, tx)
    loss = float(aux["total_loss"])
    dt = time.perf_counter() - t0

    eval_state = state.replace(
        params=state.params.replace(
            se3_refine=jnp.zeros((n_cameras, 6))
        )
    )
    out = tile_lib.render_image(eval_state, eval_cams, hold, H, W, tc)
    p = psnr(out["rgb"], images[hold])
    print(f"{backend:10s}: eval PSNR {p:6.2f} dB  "
          f"(train loss {loss:.5f}, {dt:.0f}s for {steps} steps)",
          flush=True)


def main():
    from scanerf_tpu.data.synthetic import make_sphere_dataset
    from scanerf_tpu.train import cameras as cam_lib
    from scanerf_tpu.train.tile import TileData, TrainConfig

    steps = int(os.environ.get("AB_STEPS", 300))
    n_cameras, H, W = 9, 128, 128
    images, depths, ks, c2ws = make_sphere_dataset(n_cameras, H, W)
    hold = n_cameras - 1

    base = TrainConfig(
        num_sample=64, num_bg_sample=32, batch_log2=13,
        total_step=max(steps, 1000), num_march=256,
        cam_enable=False,
    )
    data = TileData(
        images=jnp.asarray(images[:hold]),
        occlusions=jnp.ones(images[:hold].shape[:3], bool),
        cameras=cam_lib.make_cameras(ks[:hold], jnp.asarray(c2ws[:hold])),
        mono_depths=jnp.asarray(depths[:hold]),
        mono_normals=jnp.zeros((*images[:hold].shape[:3], 3)),
    )
    eval_cams = cam_lib.make_cameras(ks, jnp.asarray(c2ws))

    arms = [
        ("windowed", dict(hash_backend="windowed")),
        ("windowed-bf16", dict(hash_backend="windowed",
                               hash_bwd_bf16=True)),
        ("xla", dict(hash_backend="xla")),
        ("xla-stoch", dict(hash_backend="xla",
                           stochastic_hash_grad=True)),
    ]
    only = os.environ.get("AB_ARMS")
    if only:
        keep = set(only.split(","))
        arms = [a for a in arms if a[0] in keep]
    for backend, over in arms:
        try:
            _run_arm(backend, over, base, data, eval_cams, images, hold,
                     n_cameras, H, W, steps)
        except Exception:
            # one arm's compile rejection (e.g. a Mosaic relayout error,
            # seen 2026-08-17 on this fabric) must not void the others
            import traceback

            traceback.print_exc()
            print(f"{backend:10s}: FAILED (see traceback)", flush=True)


if __name__ == "__main__":
    main()
