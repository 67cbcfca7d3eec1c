#!/usr/bin/env python
"""Inference CLI: ``python rendering.py config.yaml LOGDIR MODE [start end]``.

Rebuild of the reference ``python rendering.py config.yaml GPU DEMO``
(rendering.py:627-644; the README calls it render.py — both names work
here, see render.py). MODE is ``VAL`` (validation views from
``refined_camera.log`` + val list, metrics to metric.txt) or ``DEMO``
(novel path from ``renderPath.log`` at 720x1280). LOGDIR is the training
log directory containing the exported ``tile-*/`` folders.
"""

from __future__ import annotations

import glob
import os
import sys
import time

import numpy as np


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(1)
    cfg_path, logdir, mode = sys.argv[1], sys.argv[2], sys.argv[3].upper()
    start = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    end = int(sys.argv[5]) if len(sys.argv) > 5 else None

    import cv2
    import jax.numpy as jnp

    from scanerf_tpu.config import parse_yaml
    from scanerf_tpu.data import io as data_io
    from scanerf_tpu.render import renderer
    from scanerf_tpu.utils import metrics

    cfg = parse_yaml(cfg_path)
    tile_dirs = renderer.list_tile_dirs(logdir)  # numeric-id order
    if not tile_dirs:
        sys.exit(f"no exported tiles under {logdir}")
    scene = renderer.load_scene(tile_dirs)
    out_dir = os.path.join(logdir, "demo" if mode == "DEMO" else "val")
    os.makedirs(out_dir, exist_ok=True)

    if mode == "DEMO":
        ks, c2ws = data_io.read_campara(
            os.path.join(cfg.DATADIR, "renderPath.log")
        )
        H, W = 720, 1280
        ks[:, 0, 2] = W / 2.0
        ks[:, 1, 2] = H / 2.0
        gt_dir = None
    else:
        cam_log = os.path.join(logdir, "refined_camera.log")
        if not os.path.exists(cam_log):
            cam_log = os.path.join(cfg.DATADIR, "camera.log")
        ks, c2ws, H, W = data_io.read_campara(cam_log, return_shape=True)
        gt_dir = os.path.join(cfg.DATADIR, "images")

    from scanerf_tpu.eval.lpips import LPIPSMetric

    lp = LPIPSMetric()
    end = end if end is not None else len(ks)
    times, psnrs, ssims, lpipss = [], [], [], []
    metric_path = os.path.join(out_dir, "metric.txt")
    for i in range(start, end):
        t0 = time.time()
        # SCANERF_EARLY_TERM=1: slab-marched early ray termination
        # (render/early_term.py — the reference's break-on-transparency,
        # rendering.py:341-345). Single-device, windowed layouts only.
        early = (os.environ.get("SCANERF_EARLY_TERM", "") == "1"
                 and scene.hash_layout == "windowed")
        out = renderer.render_image(
            scene, ks[i], c2ws[i], H, W,
            num_sample=cfg.TRAINING.NUM_SAMPLE,
            num_bg_sample=cfg.TRAINING.NUM_BG_SAMPLE,
            invalid_underground=bool(cfg.INVALID_UNDERGROUND),
            early_term=early,
            # sharded spreads rays over all local devices (no-op on 1)
            sharded=not early,
        )
        times.append(time.time() - t0)
        img = (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, f"{i}.png"), img)
        if gt_dir is not None:
            gt_path = os.path.join(gt_dir, f"{i}.png")
            if os.path.exists(gt_path):
                gt = cv2.imread(gt_path).astype(np.float32) / 255.0
                p = float(metrics.psnr(jnp.asarray(out["rgb"]), jnp.asarray(gt)))
                s = float(metrics.ssim(jnp.asarray(out["rgb"]), jnp.asarray(gt)))
                psnrs.append(p)
                ssims.append(s)
                line = f"{i}\tPSNR {p:.4f}\tSSIM {s:.4f}"
                if lp.available:
                    # the model trains on BGR-loaded images (data/io.py)
                    # and gt comes from cv2 as BGR — flip BOTH to RGB
                    v = lp(out["rgb"][..., ::-1], gt[..., ::-1])
                    lpipss.append(v)
                    line += f"\tLPIPS {v:.4f}"
                with open(metric_path, "a") as f:
                    f.write(line + "\n")
        print(f"frame {i}: {times[-1]*1000:.1f} ms")
    if psnrs:
        line = f"mean\tPSNR {np.mean(psnrs):.4f}\tSSIM {np.mean(ssims):.4f}"
        if lpipss:
            line += f"\tLPIPS {np.mean(lpipss):.4f}"
        with open(metric_path, "a") as f:
            f.write(line + "\n")
    if mode == "DEMO" and end - start > 1:
        # assemble the novel-path video (tools/tools.py:240-247)
        from scanerf_tpu.utils import media

        frames = media.frames_from_dir(out_dir)
        media.generate_video(os.path.join(out_dir, "demo.mp4"), frames)
        print(f"wrote {os.path.join(out_dir, 'demo.mp4')}")
    print(f"mean render time: {np.mean(times)*1000:.1f} ms")


if __name__ == "__main__":
    main()
