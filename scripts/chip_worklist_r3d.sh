#!/bin/bash
# Round-3d chip worklist — gated on tunnel recovery (the axon fabric
# went UNAVAILABLE ~21:04 2026-08-17; backend init failed for 25 min per
# client). Waits for a trivial matmul to succeed before starting jobs.
# Serial: ONE chip job at a time; generous timeouts — NEVER kill a job
# mid-compile on this fabric.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_r3d.log}

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe-ok', float((x @ x).sum()))
" >> "$LOG" 2>&1
}

echo "=== waiting for tunnel recovery — $(date -u +%H:%M:%S)" >> "$LOG"
until probe; do
  echo "    tunnel still down — $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 180
done
echo "=== tunnel up — $(date -u +%H:%M:%S)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== exit $? — $(date -u +%H:%M:%S)" >> "$LOG"
}

# 1. training bench: first chip measurement of the fused training
#    decoder (fresh compile at the production 16K x (128+128) workload)
T=3600 run python bench.py
# 2. clean T=4 renderer numbers (fused render kernel + fused sampler +
#    flat tables)
T=2400 run python scripts/bench_render.py 4
# 3. T=32 scale render bench (flat features_flat OOM fix, take 2)
T=3600 run python scripts/bench_render.py 32 13 scale
# 4. verify chain on the tiny scene (train -> render -> eval)
T=2400 run python train.py /tmp/vscene_cfg.yaml
T=1800 run bash -c 'LOGDIR=$(ls -dt /tmp/vscene/logs/*/ | head -1); python rendering.py /tmp/vscene_cfg.yaml $LOGDIR VAL 0 2 && python -m scanerf_tpu.eval.evaluation $LOGDIR/val /tmp/vscene/images'
# 5. city-block e2e, take 2: mid-run checkpoints every 500 steps so a
#    kill is resumable (CITY_CKP=<logdir> on rerun); 2.5 h budget
T=9000 run python scripts/city_run.py 4000
echo "WORKLIST_R3D DONE $(date -u)" >> "$LOG"
