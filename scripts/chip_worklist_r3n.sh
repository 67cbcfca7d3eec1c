#!/bin/bash
# Round-3n chip worklist — r3m minus its completed step 1 (the permute
# A/B landed in PERF.md / commit 0ddaceb before the 2026-08-19 machine
# restart wiped the rest of the queue). Ordered quick-wins-first so an
# early interruption still yields the headline fused-render number.
#  1. bench_render 4     — fused render kernel chunk numbers (default
#                          sort mode) — the r3g/PERF.md pending item.
#  2. bench_render 32    — T=32 O(K) slot-LUT scale evidence.
#  3. train_2p24         — paper-default 2^24 table single chip, post
#                          flat-layout (falls back to smaller batch).
#  4. quality_ab         — backend quality A/B (windowed/xla/stochastic
#                          + bf16 bwd) at the current kernel stack.
#  5. bench_render under runs/gather modes — informational.
#  6. probe_sort_width / probe_dma_runs — informational scalings.
#  7. city_run 4000      — fresh 8-tile city e2e incl. QUALITY-GAP line.
# Serial: ONE chip job at a time; generous timeouts; NEVER kill a job
# mid-compile on this fabric.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/root/repo/logs/chip_r3n.log}
mkdir -p "$(dirname "$LOG")"

echo "=== r3n start — $(date -u)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

# 1. fused render kernel headline (default sort mode)
T=2400 run python scripts/bench_render.py 4

# 2. T=32 scale render bench (O(K) slot LUT evidence)
T=3600 run python scripts/bench_render.py 32 13 scale

# 3. paper-default 2^24 single chip (compile can top 17 min — generous
#    timeout, never kill mid-compile)
if ! T=3600 run python scripts/train_2p24.py 8 12 24; then
  T=3600 run python scripts/train_2p24.py 8 11 24
fi

# 4. backend quality A/B (windowed / xla / stochastic + bf16 bwd)
T=6000 run python scripts/quality_ab.py

# 5. renderer chunk under the alternate permute modes (informational)
T=2400 run env SCANERF_PERMUTE_MODE=runs python scripts/bench_render.py 4
T=2400 run env SCANERF_PERMUTE_MODE=gather python scripts/bench_render.py 4

# 6. informational probes for the PERF.md fabric table
T=2400 run python scripts/probe_sort_width.py
T=2400 run python scripts/probe_dma_runs.py

# 7. fresh 8-tile city e2e (4x2 tiles, 96 cams, 4000 steps) with the
#    QUALITY-GAP train-eval vs standalone-render line
T=10800 run python scripts/city_run.py 4000

echo "WORKLIST_R3N DONE $(date -u)" >> "$LOG"
