#!/bin/bash
# Round-4b chip worklist — perf A/Bs for the round-4 changes, highest
# value first. Run AFTER r4a's city run releases the chip.
#  1. bench.py --measure — refresh the chip cache at the new-kernel
#     HEAD (the (8,128) corner-accum restructure); the delta vs the r3n
#     cache (18,115 full / 37,365 rgb) is the kernel change's gain.
#  2. bench_chunk_ab — SCANERF_CHUNK 1024/2048/4096 grid-step A/B.
#  3. bench_warp_ab tp — warp-vis re-render cost ladder + top-k 5.
#  4. bench_warp_ab q — 600-step quality runs for the candidate arms.
#  5. bench_bf16_bwd — native-bf16 one-hot construction re-A/B.
#  6. profile_windowed3 — refreshed piecewise step budget at HEAD.
# Serial: ONE chip job at a time; TERM-first timeout with kill-after
# grace (ADVICE r3); every bound >= 2x expected wall.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/root/repo/logs/chip_r4b.log}
mkdir -p "$(dirname "$LOG")"

echo "=== r4b start — $(date -u)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout --signal=TERM --kill-after=300 "${T:-7200}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

T=3600 run python bench.py --measure
T=5400 run python scripts/bench_chunk_ab.py 5
T=5400 run python scripts/bench_warp_ab.py 5 tp
T=5400 run python scripts/bench_warp_ab.py 0 q
T=3600 run python scripts/bench_bf16_bwd.py
T=2400 run python scripts/profile_windowed3.py

echo "WORKLIST_R4B DONE $(date -u)" >> "$LOG"
