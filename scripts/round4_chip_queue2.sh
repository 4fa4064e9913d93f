#!/bin/bash
# Round-4 chip queue, part 2 — after the apron A/B landed the full-apron
# default (commit f999936, headline 1.12-1.16x at r16). Remaining chip work,
# most valuable first: the rs=1 and batched-warp gate checks, the 24->120
# config, the other BASELINE configs, adversarial axes, and the served
# trajectory. Same logging contract as round4_chip_queue.sh.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r4_queue2_summary.txt
: > "$SUMMARY"

run() {
  local name=$1; shift
  local t0=$(date +%s)
  echo "=== $name: $* (start $(date -u +%H:%M:%S))" | tee -a "$SUMMARY"
  timeout 3000 "$@" > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  local dt=$(( $(date +%s) - t0 ))
  echo "--- $name rc=$rc ${dt}s: $(tail -c 400 /tmp/r4_${name}.log | tr '\n' ' ')" >> "$SUMMARY"
  echo "$name rc=$rc ${dt}s"
  if [ $rc -ne 0 ]; then
    if timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,8)); (x@x).block_until_ready()" >/dev/null 2>&1; then
      echo "    (relay still alive after ${name} failure)" | tee -a "$SUMMARY"
    else
      echo "TUNNEL DIED during ${name} — aborting queue" | tee -a "$SUMMARY"
      cat "$SUMMARY"; exit 2
    fi
  fi
}

run band_rs1       python scripts/tpu_band_check.py rs1
run band_batch     python scripts/tpu_band_check.py batch
run band_batch4k   python scripts/tpu_band_check.py hdr 4k batch smooth
run bench_batch120 python bench.py --config 4k-hdr --target-fps 120 --batched-warp --radius 16
run bench_120      python bench.py --config 4k-hdr --target-fps 120 --radius 16
run bench_4k_sdr   python bench.py --config 4k-sdr
run bench_1080p    python bench.py --config 1080p-sdr
run bench_480p     python bench.py --config 480p-sdr
run bench_noise    python bench.py --content noise --flow-content random
run served         python scripts/tpu_served_check.py
run served_batched python scripts/tpu_served_check.py --batched-warp

echo "QUEUE2 COMPLETE"; cat "$SUMMARY"
