#!/bin/bash
# Round-5 chip queue #4: re-bench the headline axes at the SERVED chain-bound
# variant (bench bound fix 39627cc): pan now prices (16,16) chains, noise
# |12| prices the (32,32) certificate instead of slow-path storms. Waits for
# queue #3. Results: /tmp/r5q4_*.json|log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r5q4_summary.txt
: > "$SUMMARY"
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

while ! grep -q "QUEUE3 DONE" /tmp/r5q3_summary.txt 2>/dev/null; do sleep 30; done
note "queue #3 done; starting"

run() {
  local name=$1; shift
  local t0=$(date +%s)
  note "START $name: $*"
  timeout 2700 "$@" > "/tmp/r5q4_${name}.json" 2> "/tmp/r5q4_${name}.log"
  local rc=$?
  note "DONE  $name rc=$rc $(( $(date +%s) - t0 ))s: $(tail -n 2 /tmp/r5q4_${name}.json 2>/dev/null | head -c 400)"
}

# Headline at the served (16,16) chains — two cold runs (repro discipline).
run headline_cb1   python bench.py
run headline_cb2   python bench.py
# Adversarial noise at the served (32,32) certificate.
run noise_cb       python bench.py --content noise --flow-content random
# 24->120 at the served chains.
run fps120_cb      python bench.py --target-fps 120
note "QUEUE4 DONE"
