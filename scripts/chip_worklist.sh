#!/bin/bash
# Round-3 chip measurement worklist — run serially (ONE chip job at a
# time; axon sessions are per-process so one crash doesn't kill the rest).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_worklist.log}

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-1800}" "$@" >> "$LOG" 2>&1
  echo "=== exit $? — $(date -u +%H:%M:%S)" >> "$LOG"
}

run python scripts/profile_windowed2.py
T=2400 AB_ARMS=windowed,windowed-bf16 AB_STEPS=400 run python scripts/quality_ab.py
run python scripts/bench_render.py 4
run python scripts/bench_render.py 32 13 scale
T=2400 run python scripts/train_2p24.py 10
T=2400 run python bench.py
echo "WORKLIST DONE $(date -u)" >> "$LOG"
