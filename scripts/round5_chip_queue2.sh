#!/bin/bash
# Round-5 chip queue #2: warp decomposition + kernel-variant A/B + the
# radius-5 fault repro. Waits for queue #1's "QUEUE DONE" marker in
# /tmp/r5q_summary.txt, then runs serially. Results: /tmp/r5q2_*.json|log,
# narrative in /tmp/r5q2_summary.txt.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r5q2_summary.txt
: > "$SUMMARY"
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

while ! grep -q "QUEUE DONE" /tmp/r5q_summary.txt 2>/dev/null; do sleep 30; done
note "queue #1 done; starting decomposition runs"

run() {
  local name=$1; shift
  local t0=$(date +%s)
  note "START $name: $*"
  timeout 2700 "$@" > "/tmp/r5q2_${name}.json" 2> "/tmp/r5q2_${name}.log"
  local rc=$?
  note "DONE  $name rc=$rc $(( $(date +%s) - t0 ))s: $(tail -n 2 /tmp/r5q2_${name}.json 2>/dev/null | head -c 400)"
}

# 1) Core decomposition at the max-quality bucket: tables vs kernel split.
run decomp_core   python scripts/tpu_warp_decomp.py --quick
# 2) Kernel-variant sweep (unroll / force_fast / chains) — reuses the core's
#    compile cache.
run decomp_sweep  python scripts/tpu_warp_decomp.py
# 3) Radius-5 fault repro (both queue-#1 crashes were in the r5 batched warp).
run r5_repro      python scripts/tpu_warp_decomp.py --radius 5 --t-batch 2 --quick
# 4) Headline bench with the unroll lever, A/B against queue #1's runs.
run bench_unroll4 env HRT_WARP_UNROLL=4 python bench.py
# 5) 24->120 with the unroll lever (the BASELINE row-4 gap is 0.56x).
run fps120_unroll4 env HRT_WARP_UNROLL=4 python bench.py --target-fps 120
note "QUEUE2 DONE"
