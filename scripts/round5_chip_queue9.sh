#!/bin/bash
# Round-5 close / round-6 opening chip queue: the runs the round-5 close
# session could not fit in its tunnel window, in priority order:
#   1. noise_blurred — the SERVED adversarial bench axis (bench.py
#      --flow-content random-blurred landed at round-5 close): blurred
#      random flow is what the warp actually sees on adversarial content.
#   2. served_noise  — the TooSlow trajectory artifact (VERDICT r4 #5).
#   3. wctx_decomp   — split the 6.0 ms warp-context build+pack (PERF.md
#      round-5 close attribution; the round-6 target).
#   4. bench_smooth / viz — the middle axis + viz re-price numbers.
# Run standalone (no sentinel): first thing in any tunnel window.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r5q9_summary.txt
: > "$SUMMARY"
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }
note "starting"
run() {
  local name=$1; shift
  local t0=$(date +%s)
  note "START $name: $*"
  timeout 2400 "$@" > "/tmp/r5q9_${name}.json" 2> "/tmp/r5q9_${name}.log"
  local rc=$?
  note "DONE  $name rc=$rc $(( $(date +%s) - t0 ))s: $(tail -n 4 /tmp/r5q9_${name}.json 2>/dev/null | head -c 400)"
}
run noise_blurred  python bench.py --content noise --flow-content random-blurred
run served_noise   python scripts/tpu_served_check.py --batched-warp --content noise
run wctx_decomp    python scripts/tpu_wctx_decomp.py --radius 16
run bench_smooth   python bench.py --flow-content smooth
run viz            python scripts/tpu_viz_bench.py 4k-hdr 16
note "QUEUE9 DONE"
