"""Sharded-render overhead check on the 8-virtual-device CPU mesh.

One physical core executes all 8 virtual devices, so wall time cannot
IMPROVE with the mesh — but it exposes any overhead the sharding adds
(resharding, collectives, per-device dispatch): equal wall time for the
same total rays means the per-chunk render is work-conserving SPMD with
zero cross-device traffic, i.e. linear scaling on real multi-chip
hardware (each chip renders its ray slice against a replicated scene —
the reference's per-GPU frame loop, rendering.py:195-270, as one
program).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_render import make_scene

    from scanerf_tpu.render import renderer

    T = 2
    scene = make_scene(T, H_table=2**16)
    N = 2**11
    rng = np.random.RandomState(1)
    rays_o = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 0.3)
    rays_d = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    kw = dict(num_sample=32, num_bg_sample=16, num_march=64,
              backend="windowed")

    mesh = Mesh(np.array(jax.devices()), ("rays",))

    def run_single():
        return renderer.render_rays(scene, rays_o, rays_d, **kw)

    def run_sharded():
        return renderer.render_rays_sharded(
            scene, rays_o, rays_d, mesh, **kw)

    for name, fn in (("1-device", run_single), ("8-device", run_sharded)):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = fn()
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e3:.0f} ms for {N} rays "
              f"({N/dt:.0f} rays/s on ONE core)", flush=True)


if __name__ == "__main__":
    main()
