#!/usr/bin/env python
"""Renderer throughput benchmark: frame time on a multi-tile scene.

Measures the standalone multi-tile renderer (both backends) at the
reference inference workload (128 fg + 128 bg samples,
rendering_kernel.cu defaults) on synthetic windowed-layout tiles.
Reports rays/s and projected 1080p (1920x1080) frame time.

Usage: python scripts/bench_render.py [n_tiles] [chunk_log2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_scene(T, H_table=2**19, seed=0):
    import jax
    import jax.numpy as jnp

    from scanerf_tpu.models import decoder as decoder_lib
    from scanerf_tpu.ops.hash_encode import make_level_resolutions
    from scanerf_tpu.render import renderer

    key = jax.random.PRNGKey(seed)
    L = 16
    inner_size = np.array([2.0, 2.0, 2.0], np.float32)
    corners, feats, decs = [], [], []
    for t in range(T):
        key, kf, kd = jax.random.split(key, 3)
        inner_corner = np.array([-1.0 + t * 1.6, -1.0, -1.0], np.float32)
        center = inner_corner + inner_size / 2
        corners.append(center - inner_size)
        feats.append(jax.random.normal(kf, (L, H_table, 2)) * 0.1)
        decs.append(decoder_lib.init_decoder(kd))
    res = make_level_resolutions(
        np.array([32, 32, 32]), np.array([2048, 2048, 2048]), L
    )
    occ = np.random.RandomState(0).rand(T, 64, 64, 64) < 0.3
    corners = np.stack(corners)
    sizes = np.broadcast_to(inner_size * 2, (T, 3)).copy()
    ug, uc, us = renderer.build_union_grid(corners, sizes, occ)
    lut, lc, lcell, ldims = renderer.build_tile_lut(corners, sizes)
    return renderer.MultiTileScene(
        tile_lut=jnp.asarray(lut),
        lut_corner=jnp.asarray(lc),
        lut_cell=jnp.asarray(lcell),
        lut_dims=ldims,
        features=jnp.stack(feats),
        features_flat=jnp.asarray(
            renderer.flatten_tables(np.stack([np.asarray(f) for f in feats]))
        ),
        decoders=jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *decs),
        resolutions=jnp.broadcast_to(jnp.asarray(res), (T, L, 3)),
        block_corner=jnp.asarray(corners),
        block_size=jnp.asarray(sizes),
        occupied=jnp.asarray(occ),
        union_occ=jnp.asarray(ug),
        union_corner=jnp.asarray(uc),
        union_size=jnp.asarray(us),
        hash_layout="windowed",
    )


def main():
    import jax
    import jax.numpy as jnp

    from scanerf_tpu.render import renderer

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    chunk_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    N = 2**chunk_log2

    scene = make_scene(T)
    rng = np.random.RandomState(1)
    rays_o = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 0.3)
    rays_d = jnp.asarray(rng.randn(N, 3).astype(np.float32))

    modes = [
        ("windowed-fused", dict(backend="windowed", fuse_decoder=True)),
        ("windowed-unfused", dict(backend="windowed", fuse_decoder=False)),
    ]
    if T <= 8 and len(sys.argv) <= 3:
        modes.append(("xla-staged", dict(backend="xla")))
    out = {}
    for name, mkw in modes:
        fn = lambda: renderer.render_rays(
            scene, rays_o, rays_d, num_sample=128, num_bg_sample=128,
            num_march=512, **mkw,
        )
        try:
            r = fn()
            _ = float(jnp.sum(r["rgb"]))  # force completion (axon)
        except Exception as e:  # keep measuring the other modes
            import traceback

            traceback.print_exc()
            out[name] = {"error": type(e).__name__}
            continue
        t0 = time.perf_counter()
        reps = 3
        for _i in range(reps):
            r = fn()
        _ = float(jnp.sum(r["rgb"]))
        dt = (time.perf_counter() - t0) / reps
        rays_s = N / dt
        out[name] = {
            "rays_per_sec": round(rays_s, 1),
            "chunk_ms": round(dt * 1000, 1),
            "frame_1080p_s": round(1920 * 1080 / rays_s, 2),
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({"n_tiles": T, "chunk": N, **out}))


if __name__ == "__main__":
    main()
