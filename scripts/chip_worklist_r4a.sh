#!/bin/bash
# Round-4a chip worklist.
#  1. city_run 4000 — the 8-tile city e2e (incl. QUALITY-GAP train-eval
#     vs standalone-render line) that r3q started but the round ended
#     before it finished. Resumable: pass CITY_CKP=<logdir> to continue
#     from the last 500-step checkpoint after a fabric kill.
# Serial: ONE chip job at a time; generous timeouts.
#
# ADVICE r3 fix: timeout now sends TERM first and only KILLs after a
# 300 s grace (past worst-case in-flight dispatch drain), and every
# bound is sized ≥2x the job's expected wall time so it cannot fire
# during a long XLA compile (compiles observed up to ~217 s per config;
# city_run compiles ~6 configs).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/root/repo/logs/chip_r4a.log}
mkdir -p "$(dirname "$LOG")"

echo "=== r4a start — $(date -u)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout --signal=TERM --kill-after=300 "${T:-7200}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

# 1. 8-tile city e2e, 4000 steps (checkpoints every 500 — resume with
#    CITY_CKP if the fabric kills it)
T=14400 run python scripts/city_run.py 4000

echo "WORKLIST_R4A DONE $(date -u)" >> "$LOG"
