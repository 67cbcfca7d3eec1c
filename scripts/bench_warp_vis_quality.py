"""Full-weight quality A/B for the warp-vis gate resolution 16/8/64 vs
the reference 128/128/512-equivalent (32/32/128 at this workload's
sample counts).

Round 4 shipped 16/8/64 as the default on 600-step evidence taken under
the reference warm-up (warp weight <= 6% of final by step 600) — the
same weakness the repo itself cites for not changing K (ADVICE r4 low
1). This is the missing test: warm-up disabled, warp weight 1.0 from
step 0, 1200 steps, pose noise 0.05 — identical protocol to the K A/B
that was accepted as decisive (bench_warp_topk_quality.py, r4d).

Arms: lean8 = 16/8/64 (current default), ref = the main sample counts
32/32/128 (exact reference parity at this workload: warp_loss.py
re-renders at the full training resolution, warp_loss.py:355-377).

Run on the real chip: python scripts/bench_warp_vis_quality.py
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import ladder_run as lr

    from scanerf_tpu.data.synthetic import write_scene_dir

    datadir = "/tmp/warp_vis_scene"
    shutil.rmtree(datadir, ignore_errors=True)
    write_scene_dir(datadir, n_cameras=12, H=64, W=64, n_tiles=1)
    shutil.copy(os.path.join(datadir, "camera.log"),
                os.path.join(datadir, "camera-gt.log"))
    results = {}
    for name, (vs, vb, vm) in [("lean8", (16, 8, 64)),
                               ("ref", (32, 32, 128))]:
        cfg = lr.make_cfg(
            datadir, PREFIX=f"QV-{name}", NOISE=0.05, TOTAL_STEP=1200,
            EVAL_STEP=300, W_WARP=1.0, W_DEPTH=0.01, W_SMOOTH=0.001,
        )
        cfg.TRAINING.LOSS.WARP_LOSS_START = 0
        cfg.TRAINING.LOSS.WARP_WARPING = False  # full weight from step 0
        cfg.TRAINING.LOSS.WARP_VIS_SAMPLE = vs
        cfg.TRAINING.LOSS.WARP_VIS_BG_SAMPLE = vb
        cfg.TRAINING.LOSS.WARP_VIS_MARCH = vm
        logdir, dt = lr.train(cfg)
        psnr, pose, _ = lr.parse_log(logdir)
        results[name] = {"wall_s": round(dt, 1), "psnr_curve": psnr,
                         "pose_err_curve": pose}
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
