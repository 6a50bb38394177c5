#!/bin/bash
# Serial TPU job supervisor (generalized from tools/round4_supervisor.sh;
# verify-skill pattern: tunnel outages can last hours — queue jobs
# behind a patient probe loop and never block the interactive session
# on recovery).
#
# Jobs are files under ${ODTPU_JOBS_DIR:-.tpu_jobs}/queue/NN_name.job
# containing one shell command. They run in lexical order, one at a
# time; each gets a health-probed tunnel first. Finished jobs move to
# done/ (exit 0) or failed/ (nonzero), with logs in logs/.
#
# NOTE: the next job NAME is bound BEFORE its probe loop, so a job
# added to the queue during an outage runs second, after the bound one.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
JOBS="$ROOT/${ODTPU_JOBS_DIR:-.tpu_jobs}"
mkdir -p "$JOBS/queue" "$JOBS/done" "$JOBS/failed" "$JOBS/logs"

probe() {
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import numpy as np, jax
x = jax.device_put(np.ones((1024, 1024), np.float32))
assert float(x.sum()) == 1024 * 1024
EOF
}

echo "[supervisor] start $(date +%T)" >> "$JOBS/logs/supervisor.log"
idle=0
while true; do
  job=$(ls "$JOBS/queue" 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    idle=$((idle+1))
    # exit after ~60 min with an empty queue
    if [ $idle -gt 120 ]; then break; fi
    sleep 30; continue
  fi
  idle=0
  until probe; do
    echo "[supervisor] probe failed, sleeping 120s $(date +%T)" >> "$JOBS/logs/supervisor.log"
    sleep 120
  done
  name="${job%.job}"
  echo "[supervisor] running $name $(date +%T)" >> "$JOBS/logs/supervisor.log"
  (cd "$ROOT" && bash "$JOBS/queue/$job") > "$JOBS/logs/$name.log" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then mv "$JOBS/queue/$job" "$JOBS/done/"; else mv "$JOBS/queue/$job" "$JOBS/failed/"; fi
  echo "[supervisor] $name rc=$rc $(date +%T)" >> "$JOBS/logs/supervisor.log"
done
echo "[supervisor] queue empty, exiting $(date +%T)" >> "$JOBS/logs/supervisor.log"
