#!/bin/bash
# Round-5 chip queue #5: flow-term decomposition. Waits for queue #4.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r5q5_summary.txt
: > "$SUMMARY"
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }
while ! grep -q "QUEUE4 DONE" /tmp/r5q4_summary.txt 2>/dev/null; do sleep 30; done
note "queue #4 done; starting"
run() {
  local name=$1; shift
  local t0=$(date +%s)
  note "START $name: $*"
  timeout 2700 "$@" > "/tmp/r5q5_${name}.json" 2> "/tmp/r5q5_${name}.log"
  local rc=$?
  note "DONE  $name rc=$rc $(( $(date +%s) - t0 ))s: $(tail -n 4 /tmp/r5q5_${name}.json 2>/dev/null | head -c 400)"
}
run flow_r16   python scripts/tpu_flow_decomp.py --radius 16
run flow_r8    python scripts/tpu_flow_decomp.py --radius 8
note "QUEUE5 DONE"
