"""Re-export a trained city run from its checkpoints (no retraining) and
re-measure the QUALITY-GAP line with the corrected refined_camera.log
(trainer._export now composes the injected pose noise in — the stale log
omitted it, misaligning every standalone render by ~NOISE rad).

Steps: resume Trainer from the old logdir's checkpoints, export tiles +
refined_camera.log into the fresh logdir, copy the old eval panels over
(quality_gap scripts read train-eval PSNR from them), then run
rendering.py VAL over global views 0..5 and print the QUALITY-GAP line.

Usage: python scripts/regen_city_export.py [old_logdir] [scene_dir]
"""

import glob
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    old = sys.argv[1] if len(sys.argv) > 1 else max(
        d for d in glob.glob("/root/repo/logs/cityscene_e2e/logs/*")
        if glob.glob(os.path.join(d, "checkpoint-*.npz")))
    scene_dir = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/logs/cityscene_e2e"
    cfg_path = os.path.join(scene_dir, "city_cfg.yaml")

    from scanerf_tpu.config import parse_yaml
    from scanerf_tpu.parallel import tile_parallel as tp
    from scanerf_tpu.train.trainer import Trainer

    cfg = parse_yaml(cfg_path)
    cfg["CKP"] = old
    t0 = time.time()
    trainer = Trainer(cfg)
    if int(np.asarray(trainer.states[0].step)) == 0:
        raise SystemExit(f"no resume from {old}")
    tiles = tp.stack_tiles(trainer.states, trainer.cam_maps)
    trainer._export(tiles)
    print(f"re-exported in {time.time()-t0:.0f}s -> {trainer.logdir}",
          flush=True)
    for f in glob.glob(os.path.join(old, "eval-tile*.png")):
        shutil.copy(f, trainer.logdir)

    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "rendering.py"),
         cfg_path, trainer.logdir, "VAL", "0", "6"],
        capture_output=True, text=True, timeout=7200,
    )
    print(r.stdout[-3000:], flush=True)
    if r.returncode != 0:
        print(r.stderr[-3000:], flush=True)

    import re

    mpath = os.path.join(trainer.logdir, "val", "metric.txt")
    evals = {}
    for f in glob.glob(os.path.join(trainer.logdir, "eval-tile*.png")):
        m = re.match(r"eval-tile(\d+)-(\d+)-(-?[\d.]+)-(-?[\d.]+)\.png",
                     os.path.basename(f))
        if m:
            t, s, p = int(m.group(1)), int(m.group(2)), float(m.group(3))
            if t not in evals or s > evals[t][0]:
                evals[t] = (s, p)
    if evals and os.path.exists(mpath):
        print(open(mpath).read(), flush=True)
        train_psnr = float(np.mean([p for _, p in evals.values()]))
        last = [ln for ln in open(mpath).read().splitlines()
                if ln.startswith("mean")]
        if last:
            render_psnr = float(last[-1].split()[2])
            print(
                f"QUALITY-GAP train-eval PSNR {train_psnr:.2f} vs "
                f"standalone-render PSNR {render_psnr:.2f} "
                f"(delta {render_psnr - train_psnr:+.2f} dB)",
                flush=True,
            )


if __name__ == "__main__":
    main()
