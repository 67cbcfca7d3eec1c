"""Diagnose the 8-tile city export->render quality gap (r4a: train-eval
PSNR 23.88 vs standalone-render 20.34 on views 0-5).

Renders each tile's OWN held-out test view through the standalone
multi-tile renderer (xla staged oracle on CPU — the export/blend/seam
logic is backend-agnostic and windowed==staged parity is tested) and
compares against the tile's final in-training eval PSNR. If these
match, the -3.5 dB on views 0-5 is a property of those (training)
views' scene coverage; if they are also ~3 dB down, the multi-tile
blending itself degrades at T=8.

Usage: python scripts/quality_gap_city.py <logdir> [n_views]
(CPU-forced; safe to run while a chip job owns the TPU.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import glob

import numpy as np


def main():
    logdir = sys.argv[1]
    n_views = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scene_dir = os.path.dirname(os.path.dirname(os.path.abspath(logdir)))

    import cv2
    import jax.numpy as jnp

    from scanerf_tpu.data import io as data_io
    from scanerf_tpu.render import renderer
    from scanerf_tpu.utils import metrics

    tile_dirs = renderer.list_tile_dirs(logdir)
    scene = renderer.load_scene(tile_dirs)
    ks, c2ws, H, W = data_io.read_campara(
        os.path.join(logdir, "refined_camera.log"), return_shape=True)

    test = {}
    with open(os.path.join(scene_dir, "blocks", "test.txt")) as f:
        for line in f:
            t, v = line.split()
            test[int(t)] = int(v)

    # final in-training eval PSNR per tile from the eval PNG names
    import re
    evals = {}
    for f in glob.glob(os.path.join(logdir, "eval-tile*.png")):
        m = re.match(r"eval-tile(\d+)-(\d+)-(-?[\d.]+)-", os.path.basename(f))
        if m:
            t, s, p = int(m.group(1)), int(m.group(2)), float(m.group(3))
            if t not in evals or s > evals[t][0]:
                evals[t] = (s, p)

    deltas = []
    for t in sorted(test)[:n_views]:
        v = test[t]
        out = renderer.render_image(
            scene, ks[v], c2ws[v], H, W,
            num_sample=64, num_bg_sample=32, backend="xla",
        )
        gt = cv2.imread(
            os.path.join(scene_dir, "images", f"{v}.png")
        ).astype(np.float32) / 255.0
        p = float(metrics.psnr(jnp.asarray(out["rgb"]), jnp.asarray(gt)))
        tr = evals.get(t, (0, float("nan")))[1]
        deltas.append(p - tr)
        print(f"tile {t} view {v}: standalone {p:.2f} vs train-eval {tr:.2f} "
              f"(delta {p - tr:+.2f} dB)", flush=True)
    print(f"mean delta {np.mean(deltas):+.2f} dB", flush=True)


if __name__ == "__main__":
    main()
