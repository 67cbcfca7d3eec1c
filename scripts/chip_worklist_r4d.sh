#!/bin/bash
# Round-4d chip worklist.
#  1. bench_warp_topk_quality — full-weight warp K=10 vs K=5 (decides
#     whether the +32% topk5 arm is quality-safe enough to document as
#     a recommended setting).
#  2. bench_render — renderer throughput refresh at the round-4 kernels.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/root/repo/logs/chip_r4d.log}
mkdir -p "$(dirname "$LOG")"
echo "=== r4d start — $(date -u)" >> "$LOG"
run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout --signal=TERM --kill-after=300 "${T:-7200}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}
T=3600 run python scripts/bench_warp_topk_quality.py
T=3600 run python scripts/bench_render.py
echo "WORKLIST_R4D DONE $(date -u)" >> "$LOG"
