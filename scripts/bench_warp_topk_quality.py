"""Stronger quality A/B for WARP_TOP_K=5 vs 10: full-weight warp.

The r4b 600-step quality runs kept the reference warm-up, which holds
the warp weight at <= 6% of its final value — enough to bound the
vis-GATE fidelity effect but weak evidence for changing K (which
selects which neighbors supervise). Here the warm-up is disabled
(warp at full weight 1.0 from step 0) over 1200 steps with pose noise
0.05, so the warp term actually shapes training.

Run on the real chip: python scripts/bench_warp_topk_quality.py
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

    datadir = "/tmp/warp_topk_scene"
    shutil.rmtree(datadir, ignore_errors=True)
    write_scene_dir(datadir, n_cameras=12, H=64, W=64, n_tiles=1)
    shutil.copy(os.path.join(datadir, "camera.log"),
                os.path.join(datadir, "camera-gt.log"))
    results = {}
    for name, k in [("K10", 10), ("K5", 5)]:
        cfg = lr.make_cfg(
            datadir, PREFIX=f"QW-{name}", NOISE=0.05, TOTAL_STEP=1200,
            EVAL_STEP=300, W_WARP=1.0, W_DEPTH=0.01, W_SMOOTH=0.001,
        )
        cfg.TRAINING.LOSS.WARP_LOSS_START = 0
        cfg.TRAINING.LOSS.WARP_WARPING = False  # full weight from step 0
        cfg.TRAINING.LOSS.WARP_TOP_K = k
        logdir, dt = lr.train(cfg)
        psnr, pose, _ = lr.parse_log(logdir)
        results[name] = {"wall_s": round(dt, 1), "psnr_curve": psnr,
                         "pose_err_curve": pose}
        print(name, json.dumps(results[name]), flush=True)


if __name__ == "__main__":
    main()
