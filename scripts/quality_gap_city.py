"""Per-view quality-gap decomposition on an exported city scene.

The city_run QUALITY-GAP line compared the per-tile in-training eval
(each tile's TEST view, blocks/test.txt) against the standalone renderer
on global views 0..5 — DIFFERENT views. This script renders the SAME
test views through the standalone renderer, twice per view:

  blend — the full exported scene (all tiles, seam blending, union grid)
  solo  — only the owning tile's export loaded (T=1)

and recomputes the in-training eval PSNR from the saved eval panel PNG
(left half pred, right half gt — uint8, i.e. the saved-image protocol).

  solo ~ train-eval, blend ~ solo  -> old gap was view mismatch only
  solo << train-eval               -> export/renderer path loses quality
  blend << solo                    -> cross-tile blending loses quality

Usage: python scripts/quality_gap_city.py [logdir] [scene_dir]
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else max(
        glob.glob("/root/repo/logs/cityscene_e2e/logs/*"))
    scene_dir = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/logs/cityscene_e2e"

    import cv2
    import jax.numpy as jnp

    from scanerf_tpu.data import io as data_io
    from scanerf_tpu.render import renderer
    from scanerf_tpu.utils import metrics

    # per-tile test views
    test = {}
    for ln in open(os.path.join(scene_dir, "blocks", "test.txt")):
        t, v = ln.split()
        test[int(t)] = int(v)

    # final in-training eval PSNR per tile, recomputed from the saved
    # panel with the CURRENT metrics (clipped pred) for comparability
    train_eval = {}
    for f in glob.glob(os.path.join(logdir, "eval-tile*.png")):
        m = re.match(r"eval-tile(\d+)-(\d+)-", os.path.basename(f))
        if not m:
            continue
        t, s = int(m.group(1)), int(m.group(2))
        if t not in train_eval or s > train_eval[t][0]:
            train_eval[t] = (s, f)
    for t, (s, f) in list(train_eval.items()):
        panel = cv2.imread(f).astype(np.float32) / 255.0
        W2 = panel.shape[1] // 2
        pred, gt = panel[:, :W2], panel[:, W2:]
        p = float(metrics.psnr(jnp.asarray(pred), jnp.asarray(gt)))
        train_eval[t] = (s, p)

    cam_log = os.path.join(logdir, "refined_camera.log")
    if not os.path.exists(cam_log):
        cam_log = os.path.join(scene_dir, "camera.log")
    ks, c2ws, H, W = data_io.read_campara(cam_log, return_shape=True)

    tile_dirs = sorted(glob.glob(os.path.join(logdir, "tile-*")))
    scene = renderer.load_scene(tile_dirs)
    kw = dict(num_sample=64, num_bg_sample=32)

    def render_psnr(sc, v):
        out = renderer.render_image(sc, ks[v], c2ws[v], H, W, **kw)
        gt = cv2.imread(
            os.path.join(scene_dir, "images", f"{v}.png")
        ).astype(np.float32) / 255.0
        return float(metrics.psnr(jnp.asarray(out["rgb"]), jnp.asarray(gt)))

    rows = []
    for t in sorted(test):
        v = test[t]
        blend = render_psnr(scene, v)
        solo = render_psnr(
            renderer.load_scene([os.path.join(logdir, f"tile-{t}")]), v
        )
        tr = train_eval.get(t, (0, float("nan")))[1]
        rows.append({"tile": t, "view": v, "train_eval": round(tr, 2),
                     "solo": round(solo, 2), "blend": round(blend, 2)})
        print(json.dumps(rows[-1]), flush=True)

    mean = lambda k: float(np.nanmean([r[k] for r in rows]))
    print(json.dumps({
        "mean_train_eval": round(mean("train_eval"), 2),
        "mean_solo": round(mean("solo"), 2),
        "mean_blend": round(mean("blend"), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
