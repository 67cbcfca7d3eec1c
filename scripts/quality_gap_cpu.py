"""CPU probe of the export->standalone-render quality gap (VERDICT r2
weak 7) with the xla oracle backend: train a small 2-tile scene through
the Trainer, render the exported scene through rendering.py at matched
sample counts, and print the train-eval vs renderer PSNR delta. The
pipeline under test (fp16 feature export, renderer seam blending, bg
multi-exit, occupancy union) is backend-agnostic, so a CPU run isolates
pipeline-induced loss from kernel differences while the chip is away.

Usage: python scripts/quality_gap_cpu.py [steps] [res]
"""

import glob
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import yaml


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    from scanerf_tpu.data.synthetic import write_scene_dir

    scene_dir = "/tmp/qualgap_scene"
    if not os.path.exists(os.path.join(scene_dir, "camera.log")):
        write_scene_dir(scene_dir, n_cameras=16, H=res, W=res, n_tiles=2)

    cfg = {
        "DATADIR": scene_dir,
        "TILES": [0, 1],
        "RHO": 100.0,
        "SYN_ITERS": 25,
        "MAX_POSES": 16,
        "EVAL_STEP": max(steps // 3, 200),
        "MAX_ROUND_STEPS": 100,
        "HASHGRID": {"LOG2_HASHMAP_SIZE": 16},
        "TRAINING": {
            "NUM_SAMPLE": 24,
            "NUM_BG_SAMPLE": 12,
            "NUM_MARCH": 128,
            "BS_LOG2DIM": 10,
            "TOTAL_STEP": steps,
            "HASH_BACKEND": "xla",
            "GRID_LOG2DIM": [4],
            "ADJUST_STEP": max(steps // 2, 500),
            "CAMOPT": {"ENABLE": False, "NOISE": 0.0, "START_STEPS": 0},
        },
    }
    cfg_path = os.path.join(scene_dir, "qualgap_cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from scanerf_tpu.config import parse_yaml
    from scanerf_tpu.train.trainer import Trainer

    t0 = time.time()
    trainer = Trainer(parse_yaml(cfg_path))
    trainer.run()
    print(f"training wall: {time.time()-t0:.0f}s -> {trainer.logdir}",
          flush=True)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys, jax; jax.config.update('jax_platforms', 'cpu');"
         f"sys.argv=['rendering.py', {cfg_path!r}, {trainer.logdir!r},"
         "'VAL', '0', '4'];"
         "import rendering; rendering.main()"],
        capture_output=True, text=True, timeout=7200, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    print(r.stdout[-2000:], flush=True)
    if r.returncode != 0:
        print(r.stderr[-3000:], flush=True)

    mpath = os.path.join(trainer.logdir, "val", "metric.txt")
    evals = {}
    for f in glob.glob(os.path.join(trainer.logdir, "eval-tile*.png")):
        m = re.match(r"eval-tile(\d+)-(\d+)-(-?[\d.]+)-(-?[\d.]+)\.png",
                     os.path.basename(f))
        if m:
            t, s, psnr = int(m.group(1)), int(m.group(2)), float(m.group(3))
            if t not in evals or s > evals[t][0]:
                evals[t] = (s, psnr)
    if evals and os.path.exists(mpath):
        train_psnr = float(np.mean([p for _, p in evals.values()]))
        last = [ln for ln in open(mpath).read().splitlines()
                if ln.startswith("mean")]
        if last:
            render_psnr = float(last[-1].split()[2])
            print(
                f"QUALITY-GAP(cpu/xla) train-eval PSNR {train_psnr:.2f} vs "
                f"standalone-render PSNR {render_psnr:.2f} "
                f"(delta {render_psnr - train_psnr:+.2f} dB)",
                flush=True,
            )


if __name__ == "__main__":
    main()
