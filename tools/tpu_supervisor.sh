#!/bin/bash
# Serial TPU job supervisor with a stall watchdog.
#
# Verify-skill pattern: axon tunnel outages can last hours and can wedge
# a RUNNING job mid-device-op (observed r5: a train blocked 40+ min in
# its final save while the plugin retry loop leaked host RAM). Queue
# jobs behind a patient health probe, and while a job runs watch its log
# mtime: silent past ODTPU_STALL_S (default 1500 s — legitimate silences
# here are <10 min: compiles, 500-image evals, orbax restores) means the
# tunnel wedged under it. Kill the job's process group (by numeric pgid,
# never by name pattern) and REQUEUE it: train jobs are idempotent via
# train.py --auto_resume / --resume, so a stall-kill only costs the
# iterations since the last SAVE_ITER. After ODTPU_MAX_STALLS (4) the
# job moves to failed/.
#
# Jobs are files under ${ODTPU_JOBS_DIR:-.tpu_jobs}/queue/NN_name.job
# containing shell commands. They run in lexical order, one at a time.
# Finished jobs move to done/ (exit 0) or failed/ (nonzero after
# retries), logs in logs/. The next job NAME is bound BEFORE its probe
# loop, so a job added during an outage runs second, after the bound one.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
JOBS="$ROOT/${ODTPU_JOBS_DIR:-.tpu_jobs}"
STALL_S=${ODTPU_STALL_S:-1500}
MAX_STALLS=${ODTPU_MAX_STALLS:-4}
mkdir -p "$JOBS/queue" "$JOBS/done" "$JOBS/failed" "$JOBS/logs"
SUP="$JOBS/logs/supervisor.log"
export PYTHONUNBUFFERED=1  # timely job logs; the watchdog reads mtime

probe() {
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import numpy as np, jax
x = jax.device_put(np.ones((1024, 1024), np.float32))
assert float(x.sum()) == 1024 * 1024
EOF
}

# run_job <jobfile> <logfile>: job in its own session/pgroup; returns
# the job's rc, or 99 if the watchdog killed it for log-silence
run_job() {
  setsid bash "$1" > "$2" 2>&1 &
  local pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    local now mt
    now=$(date +%s)
    mt=$(stat -c %Y "$2" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALL_S" ]; then
      echo "[supervisor] stall (log silent ${STALL_S}s): killing pg $pid $(date +%T)" >> "$SUP"
      kill -TERM -- "-$pid" 2>/dev/null
      sleep 10
      kill -KILL -- "-$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      return 99
    fi
  done
  wait "$pid"
}

echo "[supervisor] start $(date +%T)" >> "$SUP"
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
    echo "[supervisor] probe failed, sleeping 120s $(date +%T)" >> "$SUP"
    sleep 120
  done
  name="${job%.job}"
  echo "[supervisor] running $name $(date +%T)" >> "$SUP"
  run_job "$JOBS/queue/$job" "$JOBS/logs/$name.log"
  rc=$?
  if [ "$rc" -eq 99 ]; then
    stalls=$(cat "$JOBS/logs/$name.stalls" 2>/dev/null || echo 0)
    stalls=$((stalls+1))
    echo "$stalls" > "$JOBS/logs/$name.stalls"
    if [ "$stalls" -lt "$MAX_STALLS" ]; then
      echo "[supervisor] $name stalled ($stalls/$MAX_STALLS), requeued $(date +%T)" >> "$SUP"
      continue  # leave in queue; next loop re-probes then retries
    fi
    echo "[supervisor] $name stalled $stalls times, giving up $(date +%T)" >> "$SUP"
    mv "$JOBS/queue/$job" "$JOBS/failed/"
    continue
  fi
  if [ "$rc" -eq 0 ]; then mv "$JOBS/queue/$job" "$JOBS/done/"; else mv "$JOBS/queue/$job" "$JOBS/failed/"; fi
  echo "[supervisor] $name rc=$rc $(date +%T)" >> "$SUP"
done
echo "[supervisor] queue empty, exiting $(date +%T)" >> "$SUP"
