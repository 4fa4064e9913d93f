#!/bin/bash
# Autonomous tunnel watcher + chip-queue runner (round 4).
#
# The axon tunnel relay died mid-round (again); nothing inside the VM can
# restart it, so all chip work is queued. This script probes the tunnel with a
# tiny matmul every ~2 min and, the moment a probe answers, runs the full
# round-4 chip queue (scripts/round4_chip_queue.sh) SERIALLY, then snapshots
# every /tmp/r4_*.log + summary into artifacts/round4/ so the results survive
# session churn and can be committed by whichever session is alive next.
#
# Status protocol (read /tmp/r4_autorun.status):
#   WAITING <iter> <utc>   - still probing
#   TUNNEL_UP <utc>        - probe answered; queue starting
#   QUEUE_DONE rc=<rc>     - queue finished (see artifacts/round4/)
#   GAVE_UP <utc>          - ~12h of probes, tunnel never returned
set -u
cd /root/repo
STATUS=/tmp/r4_autorun.status
ART=/root/repo/artifacts/round4
mkdir -p "$ART"

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); print(float((x@x).sum()))" \
    > /tmp/tunnel_probe.log 2>&1
}

for i in $(seq 1 300); do
  echo "WAITING $i $(date -u +%H:%M:%S)" > "$STATUS"
  if probe; then
    echo "TUNNEL_UP $(date -u +%H:%M:%S)" > "$STATUS"
    bash scripts/round4_chip_queue.sh > /tmp/r4_queue_run.log 2>&1
    rc=$?
    cp -f /tmp/r4_*.log /tmp/r4_queue_summary.txt "$ART"/ 2>/dev/null
    echo "QUEUE_DONE rc=$rc $(date -u +%H:%M:%S)" > "$STATUS"
    exit $rc
  fi
  sleep 120
done
echo "GAVE_UP $(date -u +%H:%M:%S)" > "$STATUS"
exit 1
