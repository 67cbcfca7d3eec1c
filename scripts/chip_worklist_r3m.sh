#!/bin/bash
# Round-3m consolidated chip worklist — re-queues everything r3k lost
# to the 2026-08-19 machine restart (only r3k step 1, the headline
# bench, completed; its result is in BENCH_CHIP_CACHE.json). Uses the
# FIXED multi-arm harnesses (f172857: per-arm param copies so buffer
# donation can't delete the masters) and logs inside the repo so a
# restart no longer destroys results.
#  1. bench_permute_ab   — sort vs gather vs gather_narrow vs runs on
#                          the production training step (decision run).
#  2. bench_render x4    — fused render kernel chunk numbers per mode.
#  3. bench_render 32    — T=32 O(K) slot-LUT scale evidence.
#  4. train_2p24         — paper-default table single chip, post
#                          flat-layout (falls back to smaller batch).
#  5. quality_ab         — backend quality A/B (windowed/xla/stochastic
#                          + bf16 bwd), never re-run post kernel rework.
#  6. probe_sort_width / probe_dma_runs — informational scalings.
#  7. city_run 4000      — fresh 8-tile city e2e incl. QUALITY-GAP line.
#  8. final bench.py under the best measured training permute mode.
# Serial: ONE chip job at a time; generous timeouts; NEVER kill a job
# mid-compile on this fabric.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/root/repo/logs/chip_r3m.log}
mkdir -p "$(dirname "$LOG")"

echo "=== r3m start — $(date -u)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

# 1. training permute-mode A/B — the round-3d decision, fixed harness
T=6000 run python scripts/bench_permute_ab.py

# 2. renderer chunk under each permute mode (fused render kernel)
T=2400 run python scripts/bench_render.py 4
T=2400 run env SCANERF_PERMUTE_MODE=runs python scripts/bench_render.py 4
T=2400 run env SCANERF_PERMUTE_MODE=gather python scripts/bench_render.py 4
T=2400 run env SCANERF_PERMUTE_MODE=gather_narrow python scripts/bench_render.py 4

# 3. T=32 scale render bench (O(K) slot LUT evidence)
T=3600 run python scripts/bench_render.py 32 13 scale

# 4. paper-default 2^24 single chip, post flat-layout (compile can top
#    17 min at this table size — generous timeout, never kill mid-compile)
if ! T=3600 run python scripts/train_2p24.py 8 12 24; then
  T=3600 run python scripts/train_2p24.py 8 11 24
fi

# 5. backend quality A/B (windowed / xla / stochastic + bf16 bwd)
T=6000 run python scripts/quality_ab.py

# 6. informational probes for the PERF.md fabric table
T=2400 run python scripts/probe_sort_width.py
T=2400 run python scripts/probe_dma_runs.py

# 7. fresh 8-tile city e2e (4x2 tiles, 96 cams, 4000 steps) with the
#    QUALITY-GAP train-eval vs standalone-render line
T=10800 run python scripts/city_run.py 4000

# 8. re-run the headline bench under the best training permute mode
#    measured in step 1 (code default stays "sort" until reviewed)
BEST=$(LOG="$LOG" python - <<'EOF'
import os, re
best, best_ms = "sort", 1e18
try:
    for line in open(os.environ["LOG"]):
        m = re.search(r"permute=(\w+)\s*:\s*([0-9.]+) ms/step", line)
        if m and float(m.group(2)) < best_ms:
            best, best_ms = m.group(1), float(m.group(2))
except OSError:
    pass
print(best)
EOF
)
echo "=== best training permute mode: $BEST" >> "$LOG"
if [ "$BEST" != "sort" ]; then
  T=3600 run env SCANERF_PERMUTE_MODE="$BEST" python bench.py
fi
echo "WORKLIST_R3M DONE $(date -u)" >> "$LOG"
