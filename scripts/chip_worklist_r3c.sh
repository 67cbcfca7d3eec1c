#!/bin/bash
# Round-3c chip worklist — after the city e2e frees the chip.
# Serial (ONE chip job at a time; generous timeouts: NEVER kill a job
# mid-compile on this fabric).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_r3c.log}

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== exit $? — $(date -u +%H:%M:%S)" >> "$LOG"
}

# 1. training bench with the fused decoder (fresh compile of the fused
#    fwd+bwd kernels at the production 16K x (128+128) workload)
T=3600 run python bench.py
# 2. T=32 scale render bench (flat features_flat OOM fix, take 2)
T=3600 run python scripts/bench_render.py 32 13 scale
# 3. clean T=4 renderer numbers (fused render kernel + fused sampler +
#    flat tables)
T=2400 run python scripts/bench_render.py 4
# 4. verify chain on the tiny scene (train -> render -> eval)
T=2400 run python train.py /tmp/vscene_cfg.yaml
T=1800 run bash -c 'LOGDIR=$(ls -dt /tmp/vscene/logs/*/ | head -1); python rendering.py /tmp/vscene_cfg.yaml $LOGDIR VAL 0 2 && python -m scanerf_tpu.eval.evaluation $LOGDIR/val /tmp/vscene/images'
echo "WORKLIST_R3C DONE $(date -u)" >> "$LOG"
