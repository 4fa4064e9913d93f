#!/bin/bash
# Round-5 chip queue #3: re-run everything queue #1/#2 lost to the transient
# unroll/barrier import races, radius-5 fault repro FIRST. Waits for queue
# #2's "QUEUE2 DONE" marker. Results: /tmp/r5q3_*.json|log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r5q3_summary.txt
: > "$SUMMARY"
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

while ! grep -q "QUEUE2 DONE" /tmp/r5q2_summary.txt 2>/dev/null; do sleep 30; done
note "queue #2 done; starting"

run() {
  local name=$1; shift
  local t0=$(date +%s)
  note "START $name: $*"
  timeout 2700 "$@" > "/tmp/r5q3_${name}.json" 2> "/tmp/r5q3_${name}.log"
  local rc=$?
  note "DONE  $name rc=$rc $(( $(date +%s) - t0 ))s: $(tail -n 2 /tmp/r5q3_${name}.json 2>/dev/null | head -c 400)"
}

# 1) Radius-5 fault bisection (3/3 round-5 chip crashes were here).
run r5_repro      python scripts/tpu_warp_decomp.py --radius 5 --t-batch 2 --repro
run r5_repro_t3   python scripts/tpu_warp_decomp.py --radius 5 --t-batch 3 --repro
# 2) Warp decomposition (core, then variant sweep) at the r16 bucket.
run decomp_core   python scripts/tpu_warp_decomp.py --quick
run decomp_sweep  python scripts/tpu_warp_decomp.py
# 3) The per-config refreshes queue #1 lost.
run 4ksdr         python bench.py --config 4k-sdr
run 1080p         python bench.py --config 1080p-sdr
# 4) Viz modes priced (queue #1 run died on the unroll import race).
run viz           python scripts/tpu_viz_bench.py 4k-hdr 16
# 5) Served trajectory (watch for the r5 crash on the ramp through bucket 5).
run served        python scripts/tpu_served_check.py --batched-warp
note "QUEUE3 DONE"
