#!/bin/bash
# Round-4c chip worklist — run after r4b.
#  1. bench.py --measure — refresh the chip cache at the new
#     warp-vis-default (16/8/64) HEAD; this is the round-4 headline.
#  2. bench_fwd_bisect — isolate where the fwd windowed kernel's
#     ~144 ms actually goes (corner ALU and grid-step overhead are
#     both measured neutral; suspects: per-(l,t) dynamic fori_loop
#     sequencer cost, slab relayout, setup).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/root/repo/logs/chip_r4c.log}
mkdir -p "$(dirname "$LOG")"

echo "=== r4c start — $(date -u)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout --signal=TERM --kill-after=300 "${T:-7200}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

T=3600 run python bench.py --measure
T=3600 run python scripts/bench_fwd_bisect.py

echo "WORKLIST_R4C DONE $(date -u)" >> "$LOG"
