#!/bin/bash
# Round-5 chip queue #4 (v2): gate the uniform-subtile tier on chip, then
# re-bench the headline axes at the served kernel variants (served chain
# bounds fix 39627cc + uniform tier 0b78b2b). Waits for queue #3.
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
# GATE: the new uniform tier must be Mosaic-exact on chip before any bench
# leans on it (small geometry, full 4K HDR, batched, rs1).
run gate_uniform      python scripts/tpu_band_check.py uniform
run gate_uniform_4k   python scripts/tpu_band_check.py hdr 4k batch uniform
run gate_uniform_rs1  python scripts/tpu_band_check.py rs1 uniform
# Uniform-tier kernel A/B at the decomp harness (uniform flow content).
run decomp_uni        python scripts/tpu_warp_decomp.py --quick
# Headline at the served variants — two cold runs (repro discipline).
run headline_cb1      python bench.py
run headline_cb2      python bench.py
# Adversarial noise at the served (32,32) certificate.
run noise_cb          python bench.py --content noise --flow-content random
# 24->120 at the served variants.
run fps120_cb         python bench.py --target-fps 120
note "QUEUE4 DONE"
