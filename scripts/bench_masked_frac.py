#!/usr/bin/env python
"""Dead-ray compaction vs masked fraction (chip job).

The r5a sentinel-window routing (sort_pack ``dead=``) measured +6% on
the all-true-mask synthetic bench — pure pad-chunk skipping. The claim
"real masked workloads gain more" (PERF.md round 5) was unmeasured:
this probe runs the SAME full-recipe bench step with the occlusion
mask randomly False on a swept fraction of pixels (the training path
routes masked rays' points to the sentinel window at tile.py:339-367,
reference role: the boolean compression at tile.py:940), with
compaction on vs off, and reports rays/s per (frac, arm).

Dead rays contribute exact zeros either way (parity is tested in
tests/test_dead_compaction.py); the delta is pure step time.

Usage: python scripts/bench_masked_frac.py [fracs...]  (default 0 0.25 0.5)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    fracs = [float(a) for a in sys.argv[1:]] or [0.0, 0.25, 0.5]

    import jax
    import jax.numpy as jnp

    import bench
    from scanerf_tpu.train import tile as tile_lib

    full_kwargs = dict(w_warp=1.0, w_depth=0.01, w_smooth=0.001,
                       rho=100.0)
    out = {"workload": "bench.py full recipe", "arms": []}
    for frac in fracs:
        for compact in (True, False):
            state, data, tc, tx = bench.build(
                dict(full_kwargs, compact_dead_rays=compact))
            if frac > 0:
                rng = np.random.default_rng(0)
                occ = rng.random(data.occlusions.shape) >= frac
                data = data.replace(occlusions=jnp.asarray(occ))
            n_cameras = data.images.shape[0]
            rays_per_step = (2**tc.batch_log2 // n_cameras) // 4 * 4 \
                * n_cameras
            key = jax.random.PRNGKey(0)
            for _ in range(3):
                key, sub = jax.random.split(key)
                state, aux = tile_lib.train_step(state, data, sub, tc, tx)
            _ = float(aux["total_loss"])
            n_steps = 10
            t0 = time.perf_counter()
            for _ in range(n_steps):
                key, sub = jax.random.split(key)
                state, aux = tile_lib.train_step(state, data, sub, tc, tx)
            _ = float(aux["total_loss"])
            dt = time.perf_counter() - t0
            arm = {
                "masked_frac": frac,
                "compact": compact,
                "ms_per_step": round(dt / n_steps * 1e3, 1),
                "rays_per_sec": round(rays_per_step * n_steps / dt, 1),
            }
            out["arms"].append(arm)
            print(json.dumps(arm), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
