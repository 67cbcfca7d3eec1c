"""A/B: Pallas grid-step chunk size (SCANERF_CHUNK) on the real chip.

The windowed kernels pay a per-grid-step pipeline cost (PERF.md fabric
table); CHUNK=1024 means 4096+ grid steps for the production 4.2M-point
stream. Doubling CHUNK halves the step count at the cost of ~2x the
block-aligned padding (still a few % of the stream) and a bigger
per-chunk pts/out block. CHUNK is bound at module import, so each arm
runs in a fresh subprocess.

Run on the real chip: python scripts/bench_chunk_ab.py [n_steps]
"""

import os
import subprocess
import sys
import time

ARM = r"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import jax, jax.numpy as jnp, numpy as np
from scanerf_tpu.data.synthetic import make_sphere_dataset
from scanerf_tpu.models import field as field_lib
from scanerf_tpu.train import cameras as cam_lib
from scanerf_tpu.train import tile as tile_lib
from scanerf_tpu.train.tile import TileData, TrainConfig
from bench_step_backends import med_steps

n = int(sys.argv[1])
n_cameras, H, W = 16, 256, 256
images, depths, ks, c2ws = make_sphere_dataset(n_cameras, H, W)
tc = TrainConfig(num_sample=128, num_bg_sample=128, batch_log2=14,
                 total_step=40000, num_march=512, hash_backend="windowed")
params, fstate = field_lib.create_field(
    jax.random.PRNGKey(0),
    bbox_corner=np.array([-1.0, -1.0, -1.0]),
    bbox_size=np.array([2.0, 2.0, 2.0]),
    log2_hashmap_size=21, grid_resolution=(32, 2048), sampler_log2dim=6)
state = tile_lib.create_train_state(params, fstate, n_cameras, tc)
data = TileData(
    images=jnp.asarray(images),
    occlusions=jnp.ones(images.shape[:3], bool),
    cameras=cam_lib.make_cameras(ks, jnp.asarray(c2ws)),
    mono_depths=jnp.asarray(depths),
    mono_normals=jnp.zeros((*images.shape[:3], 3)))
tx = tile_lib.build_optimizer(tc)
B = 2**14 // n_cameras // 4 * 4 * n_cameras
t, loss = med_steps(state, data, tc, tx, n=n)
import os
print(f"chunk={os.environ['SCANERF_CHUNK']:>5s}: {t*1e3:8.1f} ms/step -> "
      f"{B/t:8.0f} rays/s (loss {loss:.4f})", flush=True)
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    t0 = time.time()
    for chunk in ("1024", "2048", "4096"):
        if time.time() - t0 > 3600:
            print(f"chunk={chunk:>5s}: SKIPPED (elapsed budget)", flush=True)
            continue
        env = dict(os.environ, SCANERF_CHUNK=chunk)
        r = subprocess.run([sys.executable, "-c", ARM, str(n)], env=env,
                           cwd="/root/repo")
        if r.returncode != 0:
            print(f"chunk={chunk:>5s}: FAILED rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
