#!/bin/bash
# Round-5 serial chip measurement queue (VERDICT r4 items 2-8).
# Run DETACHED (setsid nohup) so it survives builder-session death; waits for
# the in-flight headline bench (PID file) before touching the chip, then runs
# every remaining measurement serially. Results land in /tmp/r5q_*.log|json
# and are summarized in /tmp/r5q_summary.txt as they complete.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r5q_summary.txt
: > "$SUMMARY"
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

# Serialize behind the in-flight headline run (cold run #1 of this session).
# The PID file may hold a wrapper PID that already exited, so the argument is
# the real python PID passed by the launcher; wait until it exits.
WAIT_PID=${1:-}
if [[ -n "$WAIT_PID" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  note "headline run 1 done: $(tail -n 1 /tmp/r5_headline4.json 2>/dev/null)"
fi

run() {
  local name=$1; shift
  local t0=$(date +%s)
  note "START $name: $*"
  timeout 2700 "$@" > "/tmp/r5q_${name}.json" 2> "/tmp/r5q_${name}.log"
  local rc=$?
  note "DONE  $name rc=$rc $(( $(date +%s) - t0 ))s: $(tail -n 1 /tmp/r5q_${name}.json 2>/dev/null | head -c 300)"
}

# 2) Cold headline repro (two consecutive cold runs within 10% — VERDICT #3).
run headline2    python bench.py
# 3) 24->120 HDR (BASELINE configs row 4 — VERDICT #2 done-condition).
run fps120       python bench.py --target-fps 120
# 4) 480p at r16 with the rs=1 band default (VERDICT #4 done-condition).
run 480p         python bench.py --config 480p-sdr
# 5) Adversarial axes with (32,32) chain bounds + V tiers (VERDICT #5).
run noise        python bench.py --content noise --flow-content random
# 6) Per-config refresh at the current kernels (PERF truth pass).
run 4ksdr        python bench.py --config 4k-sdr
run 1080p        python bench.py --config 1080p-sdr
# 7) Visualization modes priced on chip (VERDICT #7 measurement half).
run viz          python scripts/tpu_viz_bench.py 4k-hdr 16
# 8) Served-path trajectory with full calibration + batched warp (VERDICT #6).
run served       python scripts/tpu_served_check.py --batched-warp
note "QUEUE DONE"
