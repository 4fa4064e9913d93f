#!/bin/bash
# Round-5 chip queue #6: r5-fault bisection round 2 — the (32,32)-chains axis
# (all crashing configs ran (32,32); the (16,16) repro passed everything,
# including the bench's exact chain shape). Waits for queue #5.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r5q6_summary.txt
: > "$SUMMARY"
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }
while ! grep -q "QUEUE5 DONE" /tmp/r5q5_summary.txt 2>/dev/null; do sleep 30; done
note "queue #5 done; starting"
run() {
  local name=$1; shift
  local t0=$(date +%s)
  note "START $name: $*"
  timeout 2700 "$@" > "/tmp/r5q6_${name}.json" 2> "/tmp/r5q6_${name}.log"
  local rc=$?
  note "DONE  $name rc=$rc $(( $(date +%s) - t0 ))s: $(tail -n 3 /tmp/r5q6_${name}.json 2>/dev/null | head -c 400)"
}
run r5_chains32      python scripts/tpu_warp_decomp.py --radius 5 --t-batch 2 --repro --chains 32
run r8_chains32      python scripts/tpu_warp_decomp.py --radius 8 --t-batch 2 --repro --chains 32
note "QUEUE6 DONE"
