#!/bin/bash
# Round-5 chip queue #7: serving artifacts now that the bucket-5 batch cap
# de-mines the scaler floor — served trajectories (pan + the adversarial
# TooSlow artifact), the smooth middle bench axis, and the viz re-price
# (mode 3 now rides the band kernel). Waits for queue #6.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r5q7_summary.txt
: > "$SUMMARY"
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }
while ! grep -q "QUEUE6 DONE" /tmp/r5q6_summary.txt 2>/dev/null; do sleep 30; done
note "queue #6 done; starting"
run() {
  local name=$1; shift
  local t0=$(date +%s)
  note "START $name: $*"
  timeout 2700 "$@" > "/tmp/r5q7_${name}.json" 2> "/tmp/r5q7_${name}.log"
  local rc=$?
  note "DONE  $name rc=$rc $(( $(date +%s) - t0 ))s: $(tail -n 3 /tmp/r5q7_${name}.json 2>/dev/null | head -c 400)"
}
run served_pan     python scripts/tpu_served_check.py --batched-warp
run served_noise   python scripts/tpu_served_check.py --batched-warp --content noise
run bench_smooth   python bench.py --flow-content smooth
run viz            python scripts/tpu_viz_bench.py 4k-hdr 16
note "QUEUE7 DONE"
