"""Exact export->renderer A/B on a trained city tile: SAME checkpoint,
SAME pose, SAME rays — training-side field render (tile.render_image)
vs the standalone renderer on that tile's fresh export.

Isolates the export/renderer path from view choice, pose refinement and
blending. Prints per-arm PSNR vs GT, the cross-PSNR between the two
renders, and depth agreement.

Usage: python scripts/export_ab.py [tile] [logdir] [scene_dir]
"""

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # only logdirs that actually hold checkpoints: every Trainer init
    # (including this script's own) creates a fresh empty logdir, and a
    # bare max(glob) can silently select one -> untrained-state A/B
    logdir = sys.argv[2] if len(sys.argv) > 2 else max(
        d for d in glob.glob("/root/repo/logs/cityscene_e2e/logs/*")
        if glob.glob(os.path.join(d, "checkpoint-*.npz")))
    scene_dir = sys.argv[3] if len(sys.argv) > 3 else \
        "/root/repo/logs/cityscene_e2e"

    import cv2
    import jax.numpy as jnp

    from scanerf_tpu.config import parse_yaml
    from scanerf_tpu.render import renderer
    from scanerf_tpu.train import checkpoint as ckpt_lib
    from scanerf_tpu.train import tile as tile_lib
    from scanerf_tpu.train.trainer import Trainer
    from scanerf_tpu.utils import metrics

    test = {}
    for ln in open(os.path.join(scene_dir, "blocks", "test.txt")):
        t, v = ln.split()
        test[int(t)] = int(v)
    view = test[tile]

    cfg = parse_yaml(os.path.join(scene_dir, "city_cfg.yaml"))
    cfg["CKP"] = logdir
    # all tiles: per-tile camera padding must match the original run's
    # (se3_refine rows = the 8-tile max), then select the tile under test
    tr = Trainer(cfg)
    ti = tr.tile_idxs.index(tile) if hasattr(tr, "tile_idxs") else tile
    state, data = tr.states[ti], tr.datas[ti]
    if int(np.asarray(state.step)) == 0:
        raise SystemExit(f"tile {tile} did not resume from {logdir}")
    li = tr.view_lists[ti].index(view)
    H, W = tr.H, tr.W

    gt = cv2.imread(
        os.path.join(scene_dir, "images", f"{view}.png")
    ).astype(np.float32) / 255.0

    out_t = tile_lib.render_image(
        state, data.cameras, li, H, W, tr.tc
    )
    p_train = float(metrics.psnr(jnp.asarray(out_t["rgb"]), jnp.asarray(gt)))

    # fresh export from this exact checkpoint state
    from scanerf_tpu.models import field as field_lib
    from scanerf_tpu.train.trainer import _slice_cams, _slice_state_cams

    n_real = len(tr.view_lists[ti])
    eff = field_lib.effective_backend(
        tr.tc.hash_backend, field_lib.table_rows(state.params.field.features)
    )
    with tempfile.TemporaryDirectory() as td:
        d = os.path.join(td, f"tile-{tile}")
        ckpt_lib.export_tile(
            d, _slice_state_cams(state, n_real),
            _slice_cams(data.cameras, n_real), tr.view_lists[ti],
            hash_layout="windowed" if eff == "windowed" else "global",
        )
        scene = renderer.load_scene([d])
        w2c44 = np.asarray(_pose44(state, data, li))[0]
        c2w = np.linalg.inv(w2c44)[:3]  # render_image re-inverts
        out_r = renderer.render_image(
            scene, np.asarray(data.cameras.ks[li]), c2w, H, W,
            num_sample=tr.tc.num_sample, num_bg_sample=tr.tc.num_bg_sample,
        )
    p_rend = float(metrics.psnr(jnp.asarray(out_r["rgb"]), jnp.asarray(gt)))
    x = float(metrics.psnr(
        jnp.asarray(out_r["rgb"]),
        jnp.asarray(np.clip(out_t["rgb"], 0, 1)),
    ))
    d_t = np.asarray(out_t["depth"]).reshape(H, W)
    d_r = np.asarray(out_r["depth"]).reshape(H, W)
    print(json.dumps({
        "tile": tile, "view": view,
        "train_psnr": round(p_train, 2),
        "render_psnr": round(p_rend, 2),
        "cross_psnr": round(x, 2),
        "depth_mad": round(float(np.abs(d_t - d_r).mean()), 4),
    }), flush=True)


def _pose44(state, data, li):
    """[1,4,4] c2w from the tile's refined pose (what render_image uses)."""
    import jax.numpy as jnp

    from scanerf_tpu.train import cameras as cam_lib

    pose = cam_lib.get_rts(data.cameras, state.params.se3_refine)[li]  # w2c [3,4]
    bot = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    return jnp.concatenate([pose, bot], axis=0)[None]


if __name__ == "__main__":
    main()
