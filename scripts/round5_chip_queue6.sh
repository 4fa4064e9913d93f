#!/bin/bash
# Round-5 chip queue #6 (v2): r5-fault UV bisection. Queue-3 narrowed the
# crash to the bucket-5 BATCHED warp at T=3 (T=2 all-passed incl. repeats
# and the bench chain shape; T=3 Y-only passed; T=3 full crashed) — this
# sweep isolates plane x batch size, plus the same sweep at r8 (control:
# fps120 ran T=5 at r8 clean) and 4k-sdr r5 (geometry axis).
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
run r5_sweep       python scripts/tpu_warp_decomp.py --radius 5 --repro
run r5_sweep_sdr   python scripts/tpu_warp_decomp.py --config 4k-sdr --radius 5 --repro
run r8_sweep       python scripts/tpu_warp_decomp.py --radius 8 --repro
note "QUEUE6 DONE"
