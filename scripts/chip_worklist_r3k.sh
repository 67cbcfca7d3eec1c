#!/bin/bash
# Round-3k consolidated chip worklist — replaces r3g..r3j, whose chain
# markers were lost in the 2026-08-19 machine restart (no /tmp logs
# survive). Everything queued while the tunnel was down, re-ordered so
# cheap decision data lands before the long city run:
#  1. bench.py          — first chip measurement of the fused training
#                          decoder; refreshes BENCH_CHIP_CACHE early so
#                          a later outage still leaves a headline.
#  2. bench_permute_ab  — sort vs gather vs gather_narrow vs runs on
#                          the production training step (the round-3d
#                          decision run).
#  3. bench_render x4   — fused render kernel chunk numbers under each
#                          permute mode (r3g item 5 + r3h + r3j item 1).
#  4. bench_render 32   — T=32 O(K) slot-LUT scale evidence.
#  5. train_2p24        — paper-default table single chip, post
#                          flat-layout (falls back to smaller batch).
#  6. quality_ab        — backend quality A/B (windowed/xla/stochastic
#                          + bf16 bwd), never re-run post kernel rework.
#  7. probe_sort_width / probe_dma_runs — informational scalings.
#  8. city_run 4000     — fresh 8-tile city e2e incl. QUALITY-GAP line
#                          (r3d checkpoints were in /tmp, gone).
#  9. final bench.py under the best measured training permute mode.
# Serial: ONE chip job at a time; generous timeouts; NEVER kill a job
# mid-compile on this fabric.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_r3k.log}

echo "=== r3k start — $(date -u)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

# 1. headline bench (fused training decoder, current tree)
T=3600 run python bench.py

# 2. training permute-mode A/B — the round-3d decision
T=6000 run python scripts/bench_permute_ab.py

# 3. renderer chunk under each permute mode (fused render kernel)
T=2400 run python scripts/bench_render.py 4
T=2400 run env SCANERF_PERMUTE_MODE=runs python scripts/bench_render.py 4
T=2400 run env SCANERF_PERMUTE_MODE=gather python scripts/bench_render.py 4
T=2400 run env SCANERF_PERMUTE_MODE=gather_narrow python scripts/bench_render.py 4

# 4. T=32 scale render bench (O(K) slot LUT evidence)
T=3600 run python scripts/bench_render.py 32 13 scale

# 5. paper-default 2^24 single chip, post flat-layout (compile can top
#    17 min at this table size — generous timeout, never kill mid-compile)
if ! T=3600 run python scripts/train_2p24.py 8 12 24; then
  T=3600 run python scripts/train_2p24.py 8 11 24
fi

# 6. backend quality A/B (windowed / xla / stochastic + bf16 bwd)
T=6000 run python scripts/quality_ab.py

# 7. informational probes for the PERF.md fabric table
T=2400 run python scripts/probe_sort_width.py
T=2400 run python scripts/probe_dma_runs.py

# 8. fresh 8-tile city e2e (4x2 tiles, 96 cams, 4000 steps) with the
#    QUALITY-GAP train-eval vs standalone-render line
T=10800 run python scripts/city_run.py 4000

# 9. re-run the headline bench under the best training permute mode
#    measured in step 2 (code default stays "sort" until reviewed)
BEST=$(python - <<'EOF'
import re
best, best_ms = "sort", 1e18
try:
    for line in open("/tmp/chip_r3k.log"):
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
echo "WORKLIST_R3K DONE $(date -u)" >> "$LOG"
