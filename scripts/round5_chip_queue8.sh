#!/bin/bash
# Round-5 chip queue #8: pyramid per-step attribution + served-adversarial
# noise axis. Waits for queue #7.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r5q8_summary.txt
: > "$SUMMARY"
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }
while ! grep -q "QUEUE7 DONE" /tmp/r5q7_summary.txt 2>/dev/null; do sleep 30; done
note "queue #7 done; starting"
run() {
  local name=$1; shift
  local t0=$(date +%s)
  note "START $name: $*"
  timeout 2700 "$@" > "/tmp/r5q8_${name}.json" 2> "/tmp/r5q8_${name}.log"
  local rc=$?
  note "DONE  $name rc=$rc $(( $(date +%s) - t0 ))s: $(tail -n 4 /tmp/r5q8_${name}.json 2>/dev/null | head -c 400)"
}
run flow_attrib    python scripts/tpu_flow_decomp.py --radius 16
run noise_served   python bench.py --content noise --flow-content random-blurred
note "QUEUE8 DONE"
