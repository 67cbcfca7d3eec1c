#!/bin/bash
# Round-5a chip worklist.
#  1. bench.py — headline refresh at the round-5 kernels (sentinel pad
#     rows, chunk-skip pl.when, dead-ray compaction default-on) + the
#     new roofline block; also the Mosaic compile gate for the edited
#     fwd/bwd/fused-train kernels (falls back unfused on rejection).
#  2. bench_early_term — renderer early-termination A/B on the trained
#     r4a city export (VERDICT r5 task 1): one-shot vs slab-marched.
#  3. bench_render — windowed renderer throughput refresh (the parked
#     fg slots now route dead: T=4 synthetic, occupancy 0.3).
#  4. bench_warp_vis_quality — full-weight 16/8/64 vs 32/32/128
#     (settles the round-4 default; VERDICT r5 task 3).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/root/repo/logs/chip_r5a.log}
mkdir -p "$(dirname "$LOG")"
echo "=== r5a start — $(date -u)" >> "$LOG"
run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout --signal=TERM --kill-after=300 "${T:-7200}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}
T=2400 BENCH_BUDGET_S=2300 run python bench.py
T=3600 run python scripts/bench_early_term.py
T=2400 run python scripts/bench_render.py 4 13 nostaged
T=5400 run python scripts/bench_warp_vis_quality.py
echo "WORKLIST_R5A DONE $(date -u)" >> "$LOG"
