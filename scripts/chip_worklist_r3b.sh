#!/bin/bash
# Round-3b chip worklist — serial (ONE chip job at a time; generous
# timeouts: NEVER kill a job mid-compile on this fabric).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_r3b.log}

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== exit $? — $(date -u +%H:%M:%S)" >> "$LOG"
}

# 0. decompose the fg sampler's 200 ms (march/gather vs CDF inversion)
T=1800 run python scripts/probe_sampler.py
# 1. T=32 scale bench: verifies the features_flat OOM fix (fresh compile)
T=3600 run python scripts/bench_render.py 32 13 scale
# 2. clean training bench (post-CDF-revert state)
T=2400 run python bench.py
# 3. the city-block e2e: 8 tiles x 4000 steps x 96 cams, ADMM + full
#    recipe, then the exported scene rendered at matched sample counts
T=14400 run python scripts/city_run.py 4000
echo "WORKLIST_R3B DONE $(date -u)" >> "$LOG"
