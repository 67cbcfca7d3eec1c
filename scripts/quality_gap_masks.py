"""Localize the city-scene blend-vs-train-eval gap per pixel region.

For each tile's test view: split pixels by whether the ray hits the
owning tile's INNER bbox, then report PSNR of (a) the in-training eval
render (left half of the saved eval panel) and (b) the standalone
blended render, on each region. If the blend loses mainly OUTSIDE the
owning tile, the gap is neighbor/bg handling, not the export path.

Usage: python scripts/quality_gap_masks.py [logdir] [scene_dir]
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ray_box_mask(rays_o, rays_d, corner, size):
    lo, hi = corner, corner + size
    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = (lo - rays_o) / rays_d
        t1 = (hi - rays_o) / rays_d
    tmin = np.minimum(t0, t1).max(axis=1)
    tmax = np.maximum(t0, t1).min(axis=1)
    return (tmax > np.maximum(tmin, 0.0))


def masked_psnr(pred, gt, mask):
    if mask.sum() == 0:
        return float("nan")
    d = (np.clip(pred, 0, 1) - gt)[mask]
    mse = float((d * d).mean())
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else max(
        glob.glob("/root/repo/logs/cityscene_e2e/logs/*"))
    scene_dir = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/logs/cityscene_e2e"

    import cv2
    import jax.numpy as jnp

    from scanerf_tpu.data import io as data_io
    from scanerf_tpu.render import renderer
    from scanerf_tpu.utils import lie, rays as rays_mod

    test = {}
    for ln in open(os.path.join(scene_dir, "blocks", "test.txt")):
        t, v = ln.split()
        test[int(t)] = int(v)

    panels = {}
    for f in glob.glob(os.path.join(logdir, "eval-tile*.png")):
        m = re.match(r"eval-tile(\d+)-(\d+)-", os.path.basename(f))
        if m:
            t, s = int(m.group(1)), int(m.group(2))
            if t not in panels or s > panels[t][0]:
                panels[t] = (s, f)

    cam_log = os.path.join(logdir, "refined_camera.log")
    if not os.path.exists(cam_log):
        cam_log = os.path.join(scene_dir, "camera.log")
    ks, c2ws, H, W = data_io.read_campara(cam_log, return_shape=True)

    scene = renderer.load_scene(renderer.list_tile_dirs(logdir))
    corners = np.asarray(scene.block_corner)
    sizes = np.asarray(scene.block_size)
    inner_c = corners + sizes / 4.0
    inner_s = sizes / 2.0

    agg = {k: [] for k in ("train_in", "train_out", "blend_in",
                           "blend_out", "x_in", "x_out", "frac_in")}
    for t in sorted(test):
        v = test[t]
        panel = cv2.imread(panels[t][1]).astype(np.float32) / 255.0
        W2 = panel.shape[1] // 2
        pred_train = panel[:, :W2]
        gt = cv2.imread(
            os.path.join(scene_dir, "images", f"{v}.png")
        ).astype(np.float32) / 255.0

        out = renderer.render_image(
            scene, ks[v], c2ws[v], H, W, num_sample=64, num_bg_sample=32
        )
        pred_blend = out["rgb"]

        xy = rays_mod.pixel_grid(H, W)
        pose = np.asarray(lie.invert(jnp.asarray(c2ws[v])))
        ro, rd = rays_mod.get_center_and_ray(
            xy, jnp.asarray(pose), jnp.asarray(ks[v])
        )
        hit = ray_box_mask(
            np.asarray(ro), np.asarray(rd), inner_c[t], inner_s[t]
        ).reshape(H, W)

        row = {
            "tile": t, "view": v, "frac_in": round(float(hit.mean()), 3),
            "train_in": round(masked_psnr(pred_train, gt, hit), 2),
            "train_out": round(masked_psnr(pred_train, gt, ~hit), 2),
            "blend_in": round(masked_psnr(pred_blend, gt, hit), 2),
            "blend_out": round(masked_psnr(pred_blend, gt, ~hit), 2),
            # where do the two renders even disagree?
            "x_in": round(masked_psnr(pred_blend, np.clip(pred_train, 0, 1),
                                      hit), 2),
            "x_out": round(masked_psnr(pred_blend, np.clip(pred_train, 0, 1),
                                       ~hit), 2),
        }
        for k in agg:
            agg[k].append(row[k])
        print(json.dumps(row), flush=True)

    print(json.dumps(
        {k: round(float(np.nanmean(vs)), 2) for k, vs in agg.items()}
    ), flush=True)


if __name__ == "__main__":
    main()
