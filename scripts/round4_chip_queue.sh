#!/bin/bash
# Round-4 chip queue (VERDICT r3 next-round items #1-#5), run SERIALLY the
# moment the axon tunnel relay returns. Each step logs to /tmp/r4_*.log and
# appends a one-line summary to /tmp/r4_queue_summary.txt. Compile caches from
# round 3 should make most steps minutes, not hours.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
SUMMARY=/tmp/r4_queue_summary.txt
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
}

# 0) liveness probe (fast fail if relay died again)
run probe python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); print(float((x@x).sum()))"
grep -q "rc=0" <(tail -1 "$SUMMARY") || { echo "TUNNEL DEAD — aborting queue"; exit 1; }

# 1) headline + all four configs (VERDICT #1)
run bench_4k_hdr   python bench.py
run bench_4k_sdr   python bench.py --config 4k-sdr
run bench_1080p    python bench.py --config 1080p-sdr
run bench_480p     python bench.py --config 480p-sdr

# 2) 24->120 HDR (VERDICT #2)
run bench_120      python bench.py --config 4k-hdr --target-fps 120

# 3) rs=1 band check (VERDICT #3) — then un-gate + re-bench 480p manually
run band_rs1       python scripts/tpu_band_check.py rs1

# 3b) per-pair batched warp (round-4 lever for 24->120): Mosaic lowering of
# the t-folded grid, then the batched bench axes. On success flip
# flow_engine.batched_warp_enabled's default.
run band_batch     python scripts/tpu_band_check.py batch
run band_batch4k   python scripts/tpu_band_check.py hdr 4k batch smooth
run bench_batched     python bench.py --batched-warp
run bench_batch120    python bench.py --config 4k-hdr --target-fps 120 --batched-warp

# 4) adversarial axes (VERDICT #4)
run bench_noise    python bench.py --content noise --flow-content random
run bench_noise12  python bench.py --content noise --flow-content random --radius 12

# 5) served-path trajectory (VERDICT #5), then the batched-serving variant
run served         python scripts/tpu_served_check.py
run served_batched python scripts/tpu_served_check.py --batched-warp

echo "QUEUE COMPLETE"; cat "$SUMMARY"
