"""A/B: cost of the warp loss's no-grad neighbor visibility re-render.

The full-recipe step re-renders B*K neighbor rays (K=10) to feed the
soft visibility/diffuseness gates (reference warp_loss.py:355-377 does
this at the FULL training sample counts; PARITY.md deviation 3b already
runs it at reduced counts, default 32+32 samples / march 128). At the
production workload that is still 160K rays x 64 samples = 10.2M
points — 2.4x the main pass's 4.2M — and is the bulk of the
full-recipe/rgb-only step-cost ratio (2.06x, PERF.md).

Two parts:
 1. throughput: full-recipe step time for vis-count ladders + top-k 5
    (the gate arms change ONLY no-grad gate inputs; gradients stay
    exact for whatever loss is computed),
 2. quality: 600-step noisy-pose ladder runs (scene A harness) for the
    candidate arms — eval PSNR + pose recovery decide whether a leaner
    default is honest.

Run on the real chip: python scripts/bench_warp_ab.py [n_steps] [part]
(part: "tp", "q", or default both)
"""

import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

FULL = dict(w_warp=1.0, w_depth=0.01, w_smooth=0.001, rho=100.0,
            warp_start=0)

TP_ARMS = [
    ("base-32/32/128", dict()),
    ("lean-16/16/64", dict(warp_vis_sample=16, warp_vis_bg_sample=16,
                           warp_vis_march=64)),
    ("lean8-16/8/64", dict(warp_vis_sample=16, warp_vis_bg_sample=8,
                           warp_vis_march=64)),
    ("topk5-32/32/128", dict(warp_top_k=5)),
]


def throughput(n):
    from bench_step_backends import med_steps

    from scanerf_tpu.data.synthetic import make_sphere_dataset
    from scanerf_tpu.models import field as field_lib
    from scanerf_tpu.train import cameras as cam_lib
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.train.tile import TileData, TrainConfig

    n_cameras, H, W = 16, 256, 256
    images, depths, ks, c2ws = make_sphere_dataset(n_cameras, H, W)
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
    B = 2**14 // n_cameras // 4 * 4 * n_cameras
    t0 = time.time()
    for i, (name, kw) in enumerate(TP_ARMS):
        # each arm pays a fresh first compile; bail before starting one
        # the worklist timeout would kill mid-compile (axon wedges hard)
        if time.time() - t0 > 3300:
            print(f"warp={name:16s}: SKIPPED (elapsed budget)", flush=True)
            continue
        tc = TrainConfig(
            num_sample=128, num_bg_sample=128, batch_log2=14,
            total_step=40000 + i,  # bust the static-arg trace cache
            num_march=512, hash_backend="windowed", **FULL, **kw,
        )
        tx = tile_lib.build_optimizer(tc)
        try:
            cp = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))
            state = tile_lib.create_train_state(
                cp(params), cp(fstate), n_cameras, tc)
            t, loss = med_steps(state, data, tc, tx, n=n)
            print(f"warp={name:16s}: {t*1e3:8.1f} ms/step -> "
                  f"{B/t:8.0f} rays/s (loss {loss:.4f})", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"warp={name:16s}: FAILED", flush=True)


Q_ARMS = [
    ("Q-base", {}),
    ("Q-lean8", {"WARP_VIS_SAMPLE": 16, "WARP_VIS_BG_SAMPLE": 8,
                 "WARP_VIS_MARCH": 64}),
    ("Q-topk5", {"WARP_TOP_K": 5}),
]


def quality():
    import shutil

    import ladder_run as lr

    from scanerf_tpu.data.synthetic import write_scene_dir

    datadir = "/tmp/warp_ab_scene"
    shutil.rmtree(datadir, ignore_errors=True)
    write_scene_dir(datadir, n_cameras=12, H=64, W=64, n_tiles=1)
    shutil.copy(os.path.join(datadir, "camera.log"),
                os.path.join(datadir, "camera-gt.log"))
    results = {}
    for name, loss_over in Q_ARMS:
        cfg = lr.make_cfg(
            datadir, PREFIX=name, NOISE=0.05, TOTAL_STEP=600,
            EVAL_STEP=200, W_WARP=1.0, W_DEPTH=0.01, W_SMOOTH=0.001,
        )
        cfg.TRAINING.LOSS.WARP_LOSS_START = 0
        for k, v in loss_over.items():
            cfg.TRAINING.LOSS[k] = v
        logdir, dt = lr.train(cfg)
        psnr, pose, loss = lr.parse_log(logdir)
        results[name] = {
            "wall_s": round(dt, 1),
            "psnr_curve": psnr,
            "pose_err_curve": pose,
        }
        print(name, json.dumps(results[name]), flush=True)
    with open("/tmp/warp_ab_quality.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    part = sys.argv[2] if len(sys.argv) > 2 else "both"
    if part in ("tp", "both"):
        throughput(n)
    if part in ("q", "both"):
        quality()
