"""A/B: "sort" vs "gather" permutation machinery in the windowed step.

The gather mode (hash_encode.set_permute_mode) replaces 3 of the train
step's 4 lax.sorts with row gathers fed by an inverse permutation that
sort_pack derives from its block tables + ONE cheap 2-operand sort.
"runs" removes the N-sized sorts entirely: the ray-coherent training
stream has ~0.11*N window-id runs, so only the run table is sorted and
both permutation directions are derived analytically (falls back to
the sorted path via lax.cond if a stream overflows the run capacity).
Outputs are bitwise identical (test_pallas_hash); this measures which
machinery is faster on the attached fabric at the production workload
(16K rays x (128+128) samples, 2^21 table).

Run on the real chip: python scripts/bench_permute_ab.py [n_steps]
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.ops.pallas import hash_encode as hw


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from scanerf_tpu.data.synthetic import make_sphere_dataset
    from scanerf_tpu.models import field as field_lib
    from scanerf_tpu.train import cameras as cam_lib
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.train.tile import TileData, TrainConfig

    sys.path.insert(0, "scripts")
    from bench_step_backends import med_steps

    n_cameras, H, W = 16, 256, 256
    images, depths, ks, c2ws = make_sphere_dataset(n_cameras, H, W)
    base = TrainConfig(
        num_sample=128, num_bg_sample=128, batch_log2=14,
        total_step=40000, num_march=512, hash_backend="windowed",
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
    tx = tile_lib.build_optimizer(base)

    import time
    import traceback
    t0 = time.time()
    for i, mode in enumerate(("sort", "gather", "gather_narrow", "runs")):
        # each arm pays a fresh first compile (3-15 min on this fabric);
        # bail before starting one that the worklist timeout would kill
        # mid-compile (axon wedges hard on mid-compile client kills)
        if time.time() - t0 > 3300:
            print(f"permute={mode:6s}: SKIPPED (elapsed budget)", flush=True)
            continue
        hw.set_permute_mode(mode)
        # tc is a static jit arg: an EQUAL config would reuse the
        # previous mode's trace — bust the cache with a timing-neutral
        # field change
        tc = dataclasses.replace(base, total_step=40000 + i)
        try:
            # train_step donates the state, which aliases params/fstate
            # buffers — hand each arm COPIES so the masters survive the
            # previous arm's donation (jit default: no donation)
            cp = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))
            state = tile_lib.create_train_state(
                cp(params), cp(fstate), n_cameras, tc)
            t, loss = med_steps(state, data, tc, tx, n=n)
            print(f"permute={mode:6s}: {t*1e3:8.1f} ms/step -> "
                  f"{B/t:8.0f} rays/s (loss {loss:.4f})", flush=True)
        except Exception as e:  # isolate arms: one rejection != no data
            traceback.print_exc()
            print(f"permute={mode:6s}: FAILED ({type(e).__name__})",
                  flush=True)
    hw.set_permute_mode("sort")


if __name__ == "__main__":
    main()
