#!/bin/bash
# Round-3g consolidated chip worklist — replaces r3d/r3e/r3f (killed
# while idle during the 2026-08-17 21:04 UTC tunnel outage). Ordering
# puts cheap decision data (probes, permute A/B) before the long city
# runs so a second outage still leaves the round with its measurements.
# Serial: ONE chip job at a time; generous timeouts; NEVER kill a job
# mid-compile on this fabric (axon-fabric-quirks).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_r3g.log}

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

# 1. headline bench: first chip measurement of the fused training
#    decoder (falls back to unfused if Mosaic rejects the kernels)
T=3600 run python bench.py
# 2. sort payload-width scaling + true take()-gather rate (~10 min)
T=2400 run python scripts/probe_sort_width.py
# 3. DMA descriptor throughput (run-length-sort expansion feasibility)
T=2400 run python scripts/probe_dma_runs.py
# 4. sort vs gather permutation machinery on the full windowed step —
#    decides whether SCANERF_PERMUTE_MODE=gather becomes the default
T=4800 run python scripts/bench_permute_ab.py
# 5. clean T=4 renderer numbers (fused render kernel + fused sampler)
T=2400 run python scripts/bench_render.py 4
# 6. T=32 scale render bench (O(K) slot LUT evidence)
T=3600 run python scripts/bench_render.py 32 13 scale
# 7. verify chain on the tiny scene (train -> render -> eval)
T=2400 run python train.py /tmp/vscene_cfg.yaml
T=1800 run bash -c 'LOGDIR=$(ls -dt /tmp/vscene/logs/*/ | head -1); python rendering.py /tmp/vscene_cfg.yaml $LOGDIR VAL 0 2 && python -m scanerf_tpu.eval.evaluation $LOGDIR/val /tmp/vscene/images'
# 8. piecewise budget of the fused pipeline
T=3600 run python scripts/profile_windowed4.py
# 9. city-block e2e: 4000 steps with mid-run checkpoints (resumable)
T=9000 run python scripts/city_run.py 4000
# 10. extend the city run to 12000 steps from its newest checkpoint
LATEST=$(ls -dt /tmp/cityscene_e2e/logs/*/ 2>/dev/null | head -1)
T=14000 CITY_CKP="$LATEST" run python scripts/city_run.py 12000
echo "WORKLIST_R3G DONE $(date -u)" >> "$LOG"
