"""Tile-parallel ADMM training scaling check on the 8-virtual-device
CPU mesh.

One physical core executes all virtual devices, so wall time measures
TOTAL WORK: an 8-tile round on the 8-device mesh that costs ~8x the
1-tile/1-device round means the shard_map round is work-conserving SPMD
(per-tile work + one small psum over 6-dof camera consensus), i.e.
near-linear tile scaling on real multi-chip hardware — the reference's
one-process-per-GPU ADMM (admm_trainer.py:339-352) as one program.

Prints per-config wall times and the derived per-device fixed overhead
F and divisible work W (t_n = n*(W_tile + F) on one core), plus the
projected multi-chip round time W_tile + F.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/scanerf_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def build_tiles(n_tiles, tc):
    from scanerf_tpu.data.synthetic import make_sphere_dataset
    from scanerf_tpu.models import field as field_lib
    from scanerf_tpu.parallel import tile_parallel as tp
    from scanerf_tpu.train import cameras as cam_lib
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.train.tile import TileData

    n_cam, H, W = 2, 32, 32
    images, depths, ks, c2ws = make_sphere_dataset(n_tiles + 1, H, W)
    states, datas, view_lists = [], [], []
    for t in range(n_tiles):
        views = [t, t + 1]
        view_lists.append(views)
        params, fstate = field_lib.create_field(
            jax.random.PRNGKey(t),
            bbox_corner=np.array([-1.0, -1.0, -1.0]),
            bbox_size=np.array([2.0, 2.0, 2.0]),
            log2_hashmap_size=15,
            grid_resolution=(8, 128),
            sampler_log2dim=3,
        )
        states.append(tile_lib.create_train_state(params, fstate, n_cam, tc))
        datas.append(TileData(
            images=jnp.asarray(images[views]),
            occlusions=jnp.ones((n_cam, H, W), bool),
            cameras=cam_lib.make_cameras(ks[views], jnp.asarray(c2ws[views])),
            mono_depths=jnp.asarray(depths[views]),
            mono_normals=jnp.zeros((n_cam, H, W, 3)),
        ))
    cam_maps = tp.make_cam_maps(view_lists, n_cam)
    tiles = tp.stack_tiles(states, cam_maps)
    data = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
    return tiles, data


def main():
    from scanerf_tpu.parallel import tile_parallel as tp
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.train.tile import TrainConfig

    tc = TrainConfig(
        num_sample=32, num_bg_sample=16, batch_log2=10, total_step=1000,
        num_march=128, rho=10.0, hash_backend="xla",
    )
    tx = tile_lib.build_optimizer(tc)
    n_inner = 4
    results = {}
    for n in (1, 8):
        tiles, data = build_tiles(n, tc)
        mesh = tp.make_tile_mesh(jax.devices()[:n])
        tiles, data = tp.shard_parallel(mesh, tiles, data)
        round_fn = tp.build_admm_round(
            mesh, tc, tx, n_inner, n_global_cams=n + 1,
            tiles_example=tiles)
        out = round_fn(tiles, data, jax.random.PRNGKey(0))
        jax.block_until_ready(out[1])
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            tiles2, losses, aux = round_fn(tiles, data,
                                           jax.random.PRNGKey(i))
            jax.block_until_ready(losses)
        dt = (time.perf_counter() - t0) / reps
        results[n] = dt
        print(f"{n}-tile/{n}-device round ({n_inner} steps): "
              f"{dt*1e3:.0f} ms on ONE core", flush=True)

    t1, t8 = results[1], results[8]
    # one-core model: t_n = n * (W_tile + F); overhead ratio vs perfect
    per_tile_8 = t8 / 8
    print(f"per-tile cost in the 8-way round: {per_tile_8*1e3:.0f} ms "
          f"vs {t1*1e3:.0f} ms solo -> SPMD overhead "
          f"{(per_tile_8/t1-1)*100:+.1f}%", flush=True)
    print(f"projected real-8-chip round time ~= solo round "
          f"({t1*1e3:.0f} ms) {'+' if per_tile_8 > t1 else '-'} "
          f"{abs(per_tile_8-t1)*1e3:.0f} ms consensus/dispatch overhead "
          f"-> ~{max(per_tile_8, t1)/t1:.2f}x of perfect linear tile "
          f"scaling", flush=True)


if __name__ == "__main__":
    main()
