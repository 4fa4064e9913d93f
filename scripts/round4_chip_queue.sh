#!/bin/bash
# Round-4 chip queue (VERDICT r3 next-round items #1-#5), run SERIALLY the
# moment the axon tunnel relay returns. Each step logs to /tmp/r4_*.log and
# appends a one-line summary to /tmp/r4_queue_summary.txt. Compile caches from
# round 3 should make most steps minutes, not hours.
#
# ORDERING: the round-3 tunnel died MID-QUEUE, so steps are ranked by value —
# headline bench first (VERDICT #1), then the two gate-flip checks
# (rs=1 + batched warp: each unlocks a default flip that improves the
# driver's end-of-round bench), then the remaining benches/trajectories.
# A short tunnel window should still yield the flips.
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
  if [ $rc -ne 0 ]; then
    # Forensics: was it the step, or did the relay die under it?
    if timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,8)); (x@x).block_until_ready()" >/dev/null 2>&1; then
      echo "    (relay still alive after ${name} failure)" | tee -a "$SUMMARY"
    else
      echo "TUNNEL DIED during ${name} — aborting queue; partial summary below" | tee -a "$SUMMARY"
      cat "$SUMMARY"; exit 2
    fi
  fi
}

# 0) liveness probe (fast fail if relay died again)
run probe python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); print(float((x@x).sum()))"
grep -q "rc=0" <(tail -1 "$SUMMARY") || { echo "TUNNEL DEAD — aborting queue"; exit 1; }

# 1) headline (VERDICT #1 — the round hinges on this one number)
run bench_4k_hdr   python bench.py

# 2) gate-flip checks next (each success flips an engine default; see
#    ROADMAP "Tunnel-return flip protocol")
run band_rs1       python scripts/tpu_band_check.py rs1
run band_batch     python scripts/tpu_band_check.py batch
run band_batch4k   python scripts/tpu_band_check.py hdr 4k batch smooth

# 3) 24->120 HDR, batched vs per-output (VERDICT #2)
run bench_batch120 python bench.py --config 4k-hdr --target-fps 120 --batched-warp
run bench_batched  python bench.py --batched-warp
run bench_120      python bench.py --config 4k-hdr --target-fps 120

# 4) remaining BASELINE configs (VERDICT #1 cont.)
run bench_4k_sdr   python bench.py --config 4k-sdr
run bench_1080p    python bench.py --config 1080p-sdr
run bench_480p     python bench.py --config 480p-sdr

# 5) adversarial axes (VERDICT #4)
run bench_noise    python bench.py --content noise --flow-content random
run bench_noise12  python bench.py --content noise --flow-content random --radius 12

# 6) served-path trajectory (VERDICT #5), then the batched-serving variant
run served         python scripts/tpu_served_check.py
run served_batched python scripts/tpu_served_check.py --batched-warp

echo "QUEUE COMPLETE"; cat "$SUMMARY"
