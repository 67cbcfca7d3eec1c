#!/usr/bin/env python
"""BASELINE ladder runs (VERDICT round-1 item 7).

Drives the real training CLI path end-to-end on synthetic scenes with
analytic ground truth, on whatever backend JAX selects (the TPU chip
under axon):

  A. noisy-pose single-tile scene (fern-analog, BASELINE config 2):
     CAMOPT.NOISE perturbs every camera; verifies PSNR rises and pose
     error falls through bundle adjustment. Run twice on the "xla"
     backend (stochastic-corner gradients ON vs OFF) and once on the
     "windowed" production backend.
  B. 4-tile ADMM scene with proxy mesh (indoor-analog, config 3):
     verifies primal/dual residuals decrease and the exported scene
     renders through rendering.py's renderer with finite metrics.

Outputs one JSON block per run; paste the summary into PERF.md.

Usage: python scripts/ladder_run.py [A|B|AB] [out.json]
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_OUT = ["/tmp/ladder_results.json"]


def _flush(results):
    import json as _json

    with open(_OUT[0], "w") as f:
        _json.dump(results, f, indent=1)


def make_cfg(datadir, **over):
    from scanerf_tpu.config import default_config

    cfg = default_config()
    cfg.DATADIR = datadir
    cfg.PREFIX = over.pop("PREFIX", "ladder")
    cfg.RHO = over.pop("RHO", 0.0)
    cfg.SYN_ITERS = over.pop("SYN_ITERS", 100)
    cfg.EVAL_STEP = over.pop("EVAL_STEP", 300)
    cfg.TILES = over.pop("TILES", [0])
    cfg.HASHGRID.LOG2_HASHMAP_SIZE = over.pop("LOG2_HASHMAP_SIZE", 16)
    T = cfg.TRAINING
    T.TOTAL_STEP = over.pop("TOTAL_STEP", 1200)
    T.NUM_SAMPLE = over.pop("NUM_SAMPLE", 32)
    T.NUM_BG_SAMPLE = over.pop("NUM_BG_SAMPLE", 32)
    T.NUM_MARCH = over.pop("NUM_MARCH", 128)
    T.BS_LOG2DIM = over.pop("BS_LOG2DIM", 12)
    T.GRID_LOG2DIM = over.pop("GRID_LOG2DIM", [5])
    T.PRUNING_TH = [0.1]
    T.HASH_BACKEND = over.pop("HASH_BACKEND", "windowed")
    T.CAMOPT.NOISE = over.pop("NOISE", 0.0)
    T.STOCHASTIC_HASH_GRAD = over.pop("STOCH", False)
    T.LOSS.WEIGHT_WARP_LOSS = over.pop("W_WARP", 0.0)
    T.LOSS.WEIGHT_DEPTH_LOSS = over.pop("W_DEPTH", 0.0)
    T.LOSS.WEIGHT_DEPTH_SMOOTH_LOSS = over.pop("W_SMOOTH", 0.0)
    assert not over, over
    return cfg


def parse_log(logdir):
    """training.log -> (psnr curve, pose-err curve, loss curve)."""
    psnr, pose, loss = [], [], []
    with open(os.path.join(logdir, "training.log")) as f:
        for line in f:
            m = re.search(r"step (\d+) .*eval_psnr ([0-9.]+)", line)
            if m:
                psnr.append((int(m.group(1)), float(m.group(2))))
            m = re.search(
                r"step (\d+) .*pose_err R ([0-9.]+)deg t ([0-9.eE+-]+)", line
            )
            if m:
                pose.append((int(m.group(1)), float(m.group(2)), float(m.group(3))))
            m = re.search(r"step (\d+)\tloss ([0-9.eE+-]+)", line)
            if m:
                loss.append((int(m.group(1)), float(m.group(2))))
    return psnr, pose, loss


def parse_admm(logdir):
    rs = []
    p = os.path.join(logdir, "admm_error.txt")
    if not os.path.exists(p):
        return rs
    with open(p) as f:
        for line in f:
            m = re.search(
                r"primal_residual: ([0-9.eE+-]+)\tdual_residual: ([0-9.eE+-]+)",
                line,
            )
            if m:
                rs.append((float(m.group(1)), float(m.group(2))))
    return rs


def train(cfg):
    from scanerf_tpu.train.trainer import Trainer

    tr = Trainer(cfg)
    t0 = time.time()
    tr.run()
    return tr.logdir, time.time() - t0


def scene_a(results):
    from scanerf_tpu.data.synthetic import write_scene_dir

    datadir = "/tmp/ladder_a"
    shutil.rmtree(datadir, ignore_errors=True)
    write_scene_dir(datadir, n_cameras=12, H=64, W=64, n_tiles=1)
    # GT poses = the clean cameras (noise is injected by the trainer)
    shutil.copy(
        os.path.join(datadir, "camera.log"),
        os.path.join(datadir, "camera-gt.log"),
    )

    # the xla-backend A/B (stochastic-corner vs exact gradients, VERDICT
    # weak 9) runs at a reduced batch/steps — the exact-scatter XLA path
    # is ~30x slower per ray than the windowed kernel and only the
    # RELATIVE PSNR/pose outcome of the pair matters
    for name, kw in [
        ("A-windowed", dict(HASH_BACKEND="windowed")),
        ("A-xla-exact", dict(HASH_BACKEND="xla", TOTAL_STEP=600,
                             BS_LOG2DIM=10, EVAL_STEP=200)),
        ("A-xla-stoch", dict(HASH_BACKEND="xla", STOCH=True, TOTAL_STEP=600,
                             BS_LOG2DIM=10, EVAL_STEP=200)),
    ]:
        cfg = make_cfg(datadir, PREFIX=name, NOISE=0.05, **kw)
        logdir, dt = train(cfg)
        psnr, pose, loss = parse_log(logdir)
        results[name] = {
            "logdir": logdir,
            "wall_s": round(dt, 1),
            "psnr_curve": psnr,
            "pose_err_curve": pose,
            "loss_first_last": [loss[0], loss[-1]] if loss else [],
        }
        print(name, json.dumps(results[name]))
        _flush(results)


def scene_b(results):
    import glob
    import subprocess

    from scanerf_tpu.data.synthetic import write_scene_dir

    datadir = "/tmp/ladder_b"
    shutil.rmtree(datadir, ignore_errors=True)
    write_scene_dir(
        datadir, n_cameras=16, H=64, W=64, n_tiles=4, unequal_views=True
    )
    shutil.copy(
        os.path.join(datadir, "camera.log"),
        os.path.join(datadir, "camera-gt.log"),
    )
    cfg = make_cfg(
        datadir, PREFIX="B-admm", TILES=[0, 1, 2, 3], RHO=100.0,
        SYN_ITERS=50, NOISE=0.02, TOTAL_STEP=600, EVAL_STEP=200,
        HASH_BACKEND="windowed",
    )
    logdir, dt = train(cfg)
    psnr, pose, loss = parse_log(logdir)
    admm = parse_admm(logdir)
    results["B-admm"] = {
        "logdir": logdir,
        "wall_s": round(dt, 1),
        "psnr_curve": psnr,
        "pose_err_curve": pose,
        "loss_first_last": [loss[0], loss[-1]] if loss else [],
        "admm_residuals_first_last": [admm[0], admm[-1]] if admm else [],
        "n_tile_exports": len(glob.glob(os.path.join(logdir, "tile-*"))),
    }
    print("B-admm", json.dumps(results["B-admm"]))
    _flush(results)

    # render 2 validation frames through the standalone renderer CLI
    cfg_path = "/tmp/ladder_b_cfg.yaml"
    with open(cfg_path, "w") as f:
        f.write(
            f"DATADIR: {datadir}\nTRAINING:\n  NUM_SAMPLE: 32\n"
            f"  NUM_BG_SAMPLE: 32\n"
        )
    r = subprocess.run(
        [sys.executable, "rendering.py", cfg_path, logdir, "VAL", "0", "2"],
        capture_output=True, text=True, timeout=1800,
    )
    metric = os.path.join(logdir, "val", "metric.txt")
    results["B-render"] = {
        "rc": r.returncode,
        "metric_txt": open(metric).read() if os.path.exists(metric) else "",
        "tail": r.stdout[-400:] + r.stderr[-400:],
    }
    print("B-render", json.dumps(results["B-render"]))
    _flush(results)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "AB"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ladder_results.json"
    _OUT[0] = out
    results = {}
    if "A" in which:
        scene_a(results)
    if "B" in which:
        scene_b(results)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
