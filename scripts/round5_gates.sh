#!/bin/bash
# Round-5 gate-flip checks — FIRST thing in any tunnel window (VERDICT r4 #1b).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r5_gates_summary.txt
: > "$SUMMARY"
run() {
  local name=$1; shift
  local t0=$(date +%s)
  echo "=== $name: $* (start $(date -u +%H:%M:%S))" | tee -a "$SUMMARY"
  timeout 3000 "$@" > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  local dt=$(( $(date +%s) - t0 ))
  echo "--- $name rc=$rc ${dt}s: $(tail -c 300 /tmp/r5_${name}.log | tr '\n' ' ')" | tee -a "$SUMMARY"
}
run band_rs1     python scripts/tpu_band_check.py rs1
run band_batch   python scripts/tpu_band_check.py batch
run band_batch4k python scripts/tpu_band_check.py hdr 4k batch smooth
echo "GATES DONE" | tee -a "$SUMMARY"
