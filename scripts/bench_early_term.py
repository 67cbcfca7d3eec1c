#!/usr/bin/env python
"""Early-ray-termination A/B on the trained city export (chip job).

Renders the same camera view through (a) the one-shot windowed renderer
and (b) the slab-marched early-termination path (render/early_term.py),
on the r4a 8-tile trained city scene — a real opacity distribution, the
regime the reference's break-on-transparency targets
(rendering.py:341-345). Reports frame time, rays/s, evaluated-row
fractions, projected 1080p time, and the image agreement between paths.

Timing follows the fabric rules (PERF.md round-3 correction): device
arrays accumulate asynchronously, ONE scalar (sum) is fetched to close
the timed region; no array ever crosses the tunnel inside the timer.

Usage: python scripts/bench_early_term.py [logdir] [res] [chunk_log2]
         [slab] [view]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def default_logdir():
    cands = sorted(glob.glob(
        "logs/cityscene_e2e/logs/*/tile-0/feature.npz"))
    assert cands, "no city export found; pass logdir explicitly"
    return os.path.dirname(os.path.dirname(cands[-1]))


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else default_logdir()
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    chunk = 2 ** (int(sys.argv[3]) if len(sys.argv) > 3 else 13)
    slab = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    view = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    # Opacity-sharpening probe (argv[6], default 1 = off): scale the
    # sigma head's pre-activation by k. softplus(k*x) sharpens the
    # learned surface monotonically (denser where dense, emptier where
    # empty) WITHOUT retraining, giving a controlled sweep of the
    # saturation fraction — the go/no-go variable for early
    # termination (reference rendering.py:341-345 only pays off when
    # rays actually cross T<1e-5). Measures the mechanism's value
    # curve: speedup as a function of frac(T_left < 1e-5).
    sharp = float(sys.argv[6]) if len(sys.argv) > 6 else 1.0

    import jax
    import jax.numpy as jnp

    from scanerf_tpu.data import io as data_io
    from scanerf_tpu.render import renderer
    from scanerf_tpu.render.early_term import render_rays_early
    from scanerf_tpu.utils import lie, rays as rays_mod

    scene = renderer.load_scene(renderer.list_tile_dirs(logdir))
    if sharp != 1.0:
        dec = dict(scene.decoders)
        dec["sigma"] = jax.tree_util.tree_map(
            lambda x: x * sharp, dec["sigma"])
        scene = scene.replace(decoders=dec)
    ks, c2ws, H0, W0 = data_io.read_campara(
        os.path.join(logdir, "refined_camera.log"), return_shape=True)
    s = res / H0
    K = np.asarray(ks[view]).copy()
    K[:2] *= s
    H, W = res, int(round(W0 * s))
    print(f"scene T={scene.features.shape[0]} H_table=2^"
          f"{int(np.log2(scene.features.shape[2]))} view={view} "
          f"{W}x{H} chunk={chunk} slab={slab}", flush=True)

    xy = rays_mod.pixel_grid(H, W)
    pose = np.asarray(lie.invert(jnp.asarray(c2ws[view])))
    rays_o, rays_d = rays_mod.get_center_and_ray(
        xy, jnp.asarray(pose), jnp.asarray(K))
    n = rays_o.shape[0]
    pad = (-n) % chunk
    rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
    rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)), constant_values=1.0)
    ntot = n + pad
    kw = dict(num_sample=128, num_bg_sample=128, num_march=512)

    def run_std():
        outs = []
        for i in range(0, ntot, chunk):
            out = renderer.render_rays(
                scene, rays_o[i:i + chunk], rays_d[i:i + chunk],
                backend="windowed", **kw)
            outs.append(out["rgb"])
        return jnp.concatenate(outs)

    def run_early(stats=None):
        outs = []
        for i in range(0, ntot, chunk):
            out = render_rays_early(
                scene, rays_o[i:i + chunk], rays_d[i:i + chunk],
                slab=slab, stats=stats, **kw)
            outs.append(out["rgb"])
        return jnp.concatenate(outs)

    out = {"res": [W, H], "chunk": chunk, "slab": slab, "view": view,
           "sigma_sharp": sharp}
    for name, fn in (("oneshot", run_std), ("early", run_early)):
        t0 = time.perf_counter()
        img = fn()
        _ = float(jnp.sum(img))
        compile_s = time.perf_counter() - t0
        times = []
        for _rep in range(3):
            t0 = time.perf_counter()
            img = fn()
            _ = float(jnp.sum(img))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        rays_s = n / dt
        out[name] = {
            "frame_s": round(dt, 2),
            "rays_per_sec": round(rays_s, 1),
            "proj_1080p_s": round(1920 * 1080 / rays_s, 1),
            "compile_s": round(compile_s, 1),
        }
        print(name, json.dumps(out[name]), flush=True)
        if name == "oneshot":
            img_std = np.asarray(img)[:n]
        else:
            img_early = np.asarray(img)[:n]

    # opacity diagnostic: early termination pays iff rays actually
    # saturate below the reference's 1e-5 — a soft (under-trained)
    # scene never triggers the break, in the reference or here
    tl = []
    for i in range(0, ntot, chunk):
        o = renderer.render_rays(
            scene, rays_o[i:i + chunk], rays_d[i:i + chunk],
            backend="windowed", **kw)
        tl.append(o["T_left"])
    tl = np.asarray(jnp.concatenate(tl))[:n]
    out["T_left"] = {
        "frac_below_1e-5": round(float((tl < 1e-5).mean()), 4),
        "frac_below_0.01": round(float((tl < 0.01).mean()), 4),
        "frac_below_0.1": round(float((tl < 0.1).mean()), 4),
        "median": round(float(np.median(tl)), 4),
    }
    print("T_left", json.dumps(out["T_left"]), flush=True)

    stats = {}
    _ = float(jnp.sum(run_early(stats)))
    fg_frac = stats["fg_rows"] / stats["full_fg_rows"]
    bg_frac = stats["bg_rows"] / stats["full_bg_rows"]
    d = np.abs(img_std - img_early)
    mse = float((d ** 2).mean())
    out["stats"] = {
        "fg_row_frac": round(fg_frac, 4),
        "bg_row_frac": round(bg_frac, 4),
        "rgb_mean_abs_diff": round(float(d.mean()), 7),
        "rgb_max_abs_diff": round(float(d.max()), 6),
        "rgb_agreement_psnr": round(
            -10 * np.log10(max(mse, 1e-12)), 2),
        "speedup": round(
            out["oneshot"]["frame_s"] / out["early"]["frame_s"], 2),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
